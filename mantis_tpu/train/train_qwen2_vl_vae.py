"""Per-arch trainer entry (reference: mantis/train/train_qwen2_vl_vae.py).

Thin shim over the generic multi-arch trainer with --arch preset to
'qwen2_vl_vae': Qwen2-VL with a VAE encoder in place of the ViT; the
VAE backbone stays frozen (reference :259-262), the latent patchify +
MLP adapter and the LM train.
"""

from mantis_tpu.train.train import main


if __name__ == "__main__":
    main(default_arch="qwen2_vl_vae")
