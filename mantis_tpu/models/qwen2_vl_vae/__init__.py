"""Qwen2-VL-VAE — experimental variant feeding diffusion-VAE latents
instead of ViT features (reference: mantis/models/qwen2_vl_vae/,
``Qwen2VLVAEForConditionalGeneration`` modeling_qwen2_vl_vae.py:292).

The VAE encoder itself is an external diffusers checkpoint in the
reference (class name taken from config, e.g. AutoencoderKLMochi);
diffusers is not part of this image, so the model here consumes
PRE-COMPUTED latents ([N, C_lat, H_lat, W_lat]) — the in-graph parts
(latent patchify, VAEVisionMlp projector, Qwen2-VL-style 2-D rotary
grid with spatial_merge_size) are fully implemented.
"""

from mantis_tpu.models.qwen2_vl_vae.model import (
    Qwen2VLVAEConfig,
    forward,
    init_params,
    latent_grid_thw,
)
