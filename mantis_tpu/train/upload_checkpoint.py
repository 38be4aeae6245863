"""Push a trained checkpoint to the HF hub
(reference: mantis/train/upload_checkpoint.py).  Requires egress."""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", required=True,
                   help="HF-layout dir (see mantis_tpu.io.hf_export)")
    p.add_argument("--repo_id", required=True)
    p.add_argument("--private", action="store_true")
    a = p.parse_args()
    try:
        from huggingface_hub import HfApi
    except ImportError as e:
        raise SystemExit(f"huggingface_hub unavailable: {e}")
    api = HfApi()
    api.create_repo(a.repo_id, private=a.private, exist_ok=True)
    api.upload_folder(folder_path=a.checkpoint_dir, repo_id=a.repo_id)
    print(f"uploaded {a.checkpoint_dir} -> {a.repo_id}")


if __name__ == "__main__":
    main()
