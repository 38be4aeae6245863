"""Interactive multi-image chat CLI — the TPU equivalent of the
reference's examples/chat_mantis_cli.py.

Commands inside the loop:
  /image <path>   attach an image to the next message
  /clear          reset the conversation
  /quit           exit

--kv_reuse keeps the KV cache live across turns (ChatSession,
generation/session.py): each turn prefills only the new tokens —
turn-N latency stays flat instead of growing with the history.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import argparse

from PIL import Image

from mantis_tpu.models.mllava import MantisLlava


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--stream", action="store_true")
    p.add_argument("--kv_reuse", action="store_true",
                   help="multi-turn KV-cache reuse (incremental "
                        "prefill; excludes --stream)")
    p.add_argument("--max_ctx", type=int, default=8192)
    p.add_argument("--speculative", type=int, default=0,
                   help="prompt-lookup speculative decoding: drafts "
                        "per verify pass (0 = off; greedy only)")
    p.add_argument("--quantize", default=None, choices=["int8", "int4"],
                   help="weight-only LM quantization at load + int8 KV "
                        "— an 8B bf16 checkpoint does not fit one "
                        "16 GB v5e (docs/SERVING.md)")
    args = p.parse_args()
    if args.speculative and args.stream:
        p.error("--speculative and --stream are mutually exclusive "
                "(the streaming loop decodes one token at a time)")
    model = MantisLlava.from_pretrained(args.model,
                                        quantize=args.quantize)
    model.speculative = args.speculative
    session = None
    if args.kv_reuse:
        if args.stream:
            p.error("--kv_reuse and --stream are mutually exclusive")
        from mantis_tpu.generation.session import ChatSession

        session = ChatSession(model, max_ctx=args.max_ctx)
    history = None
    pending_images = []
    print("Mantis chat. /image <path> to attach, /clear, /quit.")
    while True:
        try:
            line = input("USER: ").strip()
        except EOFError:
            break
        if not line:
            continue
        if line == "/quit":
            break
        if line == "/clear":
            history, pending_images = None, []
            if session is not None:
                session.reset()
            continue
        if line.startswith("/image "):
            pending_images.append(Image.open(line[7:].strip()))
            print(f"[{len(pending_images)} image(s) attached]")
            continue
        text = line + " " + "<image>" * len(pending_images) \
            if pending_images and "<image>" not in line else line
        if session is not None:
            reply = session.send(text, images=pending_images or None)
            print(f"ASSISTANT ({session.prefilled_tokens} tok "
                  f"prefilled): {reply}")
        elif args.stream:
            print("ASSISTANT: ", end="", flush=True)
            chunks = []
            for piece in model.chat_stream(text, pending_images or None,
                                           history=history):
                print(piece, end="", flush=True)
                chunks.append(piece)
            print()
            reply = "".join(chunks)
            if history is None:
                history = []
            history += [
                {"role": "user", "text": text},
                {"role": "assistant", "text": reply},
            ]
        else:
            reply, history = model.chat(text, pending_images or None,
                                        history=history)
            print("ASSISTANT:", reply)
        pending_images = []


if __name__ == "__main__":
    main()
