"""Qwen2-VL-VAE model body (see package docstring)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import einops
import jax
import jax.numpy as jnp

from mantis_tpu.models import llama
from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.models.mllava.model import cross_entropy_loss
from mantis_tpu.models.qwen2_vl.model import _merge_visual


@dataclasses.dataclass(frozen=True)
class Qwen2VLVAEConfig:
    latent_channels: int = 12
    latent_patch_size: int = 2
    vae_base_channels: int = 64
    vae_channel_mults: tuple = (1, 2, 4, 4)
    # "kl2d" = per-frame AutoencoderKL; "mochi3d" = causal-3D encoder
    # (reference: AutoencoderKLMochi from config,
    # modeling_qwen2_vl_vae.py:121-143) — see vae.py
    vae_type: str = "kl2d"
    vae_temporal_expansions: tuple = (1, 2, 3)
    spatial_merge_size: int = 2
    vision_hidden: int = 1280
    text_config: LlamaConfig = dataclasses.field(
        default_factory=lambda: LlamaConfig(
            vocab_size=152064, hidden_size=3584, intermediate_size=18944,
            num_hidden_layers=28, num_attention_heads=28,
            num_key_value_heads=4, rope_theta=1e6, rms_norm_eps=1e-6,
            attention_bias=True, mrope_section=(16, 24, 24)))
    image_token_id: int = 151655
    ignore_index: int = -100
    image_size: int = 336  # static frame size fed to the VAE encoder

    @property
    def patch_dim(self) -> int:
        return self.latent_channels * self.latent_patch_size ** 2

    @property
    def vae_downsample(self) -> int:
        return 2 ** (len(self.vae_channel_mults) - 1)

    @property
    def tokens_per_image(self) -> int:
        """Merged visual tokens per frame: VAE downsample -> latent
        patchify -> spatial merge (reference
        modeling_qwen2_vl_vae.py:169-196 grid arithmetic)."""
        side = (self.image_size // self.vae_downsample
                // self.latent_patch_size // self.spatial_merge_size)
        return side * side


def latent_grid_thw(h_lat: int, w_lat: int, cfg: Qwen2VLVAEConfig):
    """Token grid after latent patchify (before spatial merge)."""
    return (1, h_lat // cfg.latent_patch_size,
            w_lat // cfg.latent_patch_size)


def _vae_cfg(cfg: Qwen2VLVAEConfig):
    from mantis_tpu.models.qwen2_vl_vae.vae import (
        CausalVAE3DConfig, VAEEncoderConfig)

    if cfg.vae_type == "mochi3d":
        return CausalVAE3DConfig(
            latent_channels=cfg.latent_channels,
            base_channels=cfg.vae_base_channels,
            channel_mults=cfg.vae_channel_mults,
            temporal_expansions=cfg.vae_temporal_expansions)
    return VAEEncoderConfig(latent_channels=cfg.latent_channels,
                            base_channels=cfg.vae_base_channels,
                            channel_mults=cfg.vae_channel_mults)


def init_params(cfg: Qwen2VLVAEConfig, key, dtype=jnp.float32,
                with_vae: bool = False):
    k1, k2, k3, kl = jax.random.split(key, 4)
    d = cfg.vision_hidden
    dt = cfg.text_config.hidden_size
    merged = d * cfg.spatial_merge_size ** 2

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(
            dtype)

    params = {
        "latent_patch_embed": norm(k1, (cfg.patch_dim, d)),
        # VAEVisionMlp projector (reference
        # modeling_qwen2_vl_vae.py:103): merged latents -> text hidden
        "mlp_fc1": norm(k2, (merged, merged)),
        "mlp_fc1_b": jnp.zeros((merged,), dtype),
        "mlp_fc2": norm(k3, (merged, dt)),
        "mlp_fc2_b": jnp.zeros((dt,), dtype),
        "language_model": llama.init_params(cfg.text_config, kl, dtype),
    }
    if with_vae:
        from mantis_tpu.models.qwen2_vl_vae import vae as vae_lib

        init_fn = (vae_lib.init_vae_encoder_3d
                   if cfg.vae_type == "mochi3d"
                   else vae_lib.init_vae_encoder)
        params["vae"] = init_fn(
            _vae_cfg(cfg), jax.random.fold_in(key, 7), dtype)
    return params


def encode_latents(params, cfg: Qwen2VLVAEConfig, latents):
    """latents [N, C, H, W] -> merged visual tokens [N*tok, Dt]."""
    p = cfg.latent_patch_size
    m = cfg.spatial_merge_size
    x = einops.rearrange(
        latents, "n c (hh p1) (ww p2) -> n (hh ww) (c p1 p2)",
        p1=p, p2=p)
    x = x.astype(params["latent_patch_embed"].dtype) @ params[
        "latent_patch_embed"]
    n, seq, d = x.shape
    side_h = latents.shape[2] // p
    side_w = latents.shape[3] // p
    # spatial-merge grouping (2x2 neighborhoods -> one token)
    x = x.reshape(n, side_h // m, m, side_w // m, m, d)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        n * (side_h // m) * (side_w // m), m * m * d)
    x = jax.nn.gelu(x @ params["mlp_fc1"] + params["mlp_fc1_b"],
                    approximate=False)
    return x @ params["mlp_fc2"] + params["mlp_fc2_b"]


def forward(params, cfg: Qwen2VLVAEConfig, *, input_ids,
            latents: Optional[jax.Array] = None,
            pixel_values: Optional[jax.Array] = None, positions=None,
            segment_ids=None, labels=None, kv_cache=None,
            attn_impl=None, use_remat=False):
    """pixel_values [N, C, H, W] go through the in-tree VAE encoder
    (params["vae"], see vae.py — the reference's diffusers
    AutoencoderKL equivalent) when raw frames are given instead of
    precomputed latents."""
    embeds = params["language_model"]["embed_tokens"][input_ids]
    if pixel_values is not None and latents is None \
            and input_ids.shape[1] > 1:
        from mantis_tpu.models.qwen2_vl_vae import vae as vae_lib

        assert "vae" in params, "init with init_params(..., with_vae=...)"
        if cfg.vae_type == "mochi3d":
            assert pixel_values.ndim == 5, \
                "mochi3d consumes clips [N, T, C, H, W]"
            lat5 = vae_lib.encode_3d(params["vae"], _vae_cfg(cfg),
                                     pixel_values)
            n, tl = lat5.shape[:2]
            # latent frames become independent images for patchify
            latents = lat5.reshape((n * tl,) + lat5.shape[2:])
        else:
            latents = vae_lib.encode(params["vae"], _vae_cfg(cfg),
                                     pixel_values)
    if latents is not None and input_ids.shape[1] > 1:
        vis = encode_latents(params, cfg, latents)
        embeds = _merge_visual(embeds, input_ids, vis,
                               cfg.image_token_id)
    logits, new_cache = llama.forward(
        params["language_model"], cfg.text_config, inputs_embeds=embeds,
        positions=positions, segment_ids=segment_ids, kv_cache=kv_cache,
        attn_impl=attn_impl, use_remat=use_remat)
    loss = None
    if labels is not None:
        mask = None if segment_ids is None else (segment_ids != 0)
        loss = cross_entropy_loss(logits, labels, mask, cfg.ignore_index)
    return logits, loss, new_cache
