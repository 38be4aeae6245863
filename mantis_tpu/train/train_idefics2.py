"""Per-arch trainer entry (reference: mantis/train/train_idefics2.py).

Thin shim over the generic multi-arch trainer with --arch preset to
'idefics2'; all reference-specific policies (freezing, LoRA targets, label
ignore rules, collation) live in mantis_tpu.train.archs.
"""

from mantis_tpu.train.train import main


if __name__ == "__main__":
    main(default_arch="idefics2")
