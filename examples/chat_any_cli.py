"""Interactive chat CLI for ANY supported architecture.

Uses the eval adapters' checkpoint loading + greedy generation
(benchmark/adapters/chat_models.py); the flagship MLlava keeps its
richer multi-turn CLI (chat_mantis_cli.py).

  python examples/chat_any_cli.py --model idefics2:/ckpts/my-idefics2
Commands: /image <path>, /video <path>, /quit
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

from mantis_tpu.benchmark.adapters import MLLM_Models


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   help="<arch>:<checkpoint_dir> (idefics2, idefics3, "
                        "internvl, qwen2_vl, mfuyu, openflamingo, "
                        "mantis-tpu)")
    p.add_argument("--max_new_tokens", type=int, default=256)
    args = p.parse_args()
    adapter = MLLM_Models(args.model)()
    if hasattr(adapter, "max_new_tokens"):
        adapter.max_new_tokens = args.max_new_tokens

    pending = []
    print("ready. /image|/video <path> to attach, /quit to exit.")
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        if line == "/quit":
            break
        if line.startswith("/image "):
            pending.append(("image", line.split(" ", 1)[1]))
            print(f"[{len(pending)} attachment(s)]")
            continue
        if line.startswith("/video "):
            # video-encoder archs (videollava) take the clip whole;
            # others receive sampled frames as images via the adapter
            pending.append(("video", line.split(" ", 1)[1]))
            print(f"[{len(pending)} attachment(s)]")
            continue
        messages = [{"type": t_, "content": p_} for t_, p_ in pending]
        messages.append({"type": "text", "content": line})
        pending = []
        print(adapter(messages), flush=True)


if __name__ == "__main__":
    main()
