"""VAE encoder for the Qwen2-VL-VAE experimental family.

The reference instantiates a diffusers VAE by class name (reference:
mantis/models/qwen2_vl_vae/modeling_qwen2_vl_vae.py:121-143,
``AutoencoderKLMochi.from_config``) and feeds its latents into the
latent patchify path.  diffusers is not available in this image (it is
an optional dependency in the reference too), so this is a functional
JAX implementation of the standard AutoencoderKL ENCODER topology:
conv_in -> [ResnetBlock x N + stride-2 downsample] per level -> mid
resnets -> GroupNorm/SiLU -> conv_out -> (mean, logvar) -> latents.

Two encoder topologies are provided (selectable via
``Qwen2VLVAEConfig.vae_type``):

- ``kl2d`` (VAEEncoderConfig / encode): per-frame 2-D AutoencoderKL —
  the round-2 baseline, matching how the rest of this family treats
  videos as frame sequences;
- ``mochi3d`` (CausalVAE3DConfig / encode_3d): Mochi-style CAUSAL 3-D —
  temporal convs left-pad replicated first frames, group norm is
  per-frame, and temporal downsampling is a strided causal conv with
  per-level ``temporal_expansions``, so latent frame t depends only on
  input frames <= t (the property that makes Mochi latents streamable).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEEncoderConfig:
    in_channels: int = 3
    base_channels: int = 64
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)
    layers_per_block: int = 2
    latent_channels: int = 12
    groups: int = 32

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.channel_mults) - 1)


def _conv_init(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
    return (w * (2.0 / fan_in) ** 0.5).astype(dtype)


def init_vae_encoder(cfg: VAEEncoderConfig, key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 256))
    c0 = cfg.base_channels

    def conv(cin, cout, k=3):
        return {"w": _conv_init(next(keys), k, k, cin, cout, dtype),
                "b": jnp.zeros((cout,), dtype)}

    def resnet(cin, cout):
        p = {
            "n1": jnp.ones((cin,), dtype), "n1b": jnp.zeros((cin,), dtype),
            "c1": conv(cin, cout),
            "n2": jnp.ones((cout,), dtype),
            "n2b": jnp.zeros((cout,), dtype),
            "c2": conv(cout, cout),
        }
        if cin != cout:
            p["skip"] = conv(cin, cout, k=1)
        return p

    params = {"conv_in": conv(cfg.in_channels, c0), "down": []}
    ch = c0
    for li, mult in enumerate(cfg.channel_mults):
        out_ch = c0 * mult
        level = {"resnets": []}
        for _ in range(cfg.layers_per_block):
            level["resnets"].append(resnet(ch, out_ch))
            ch = out_ch
        if li < len(cfg.channel_mults) - 1:
            level["downsample"] = conv(ch, ch)
        params["down"].append(level)
    params["mid1"] = resnet(ch, ch)
    params["mid2"] = resnet(ch, ch)
    params["norm_out"] = jnp.ones((ch,), dtype)
    params["norm_out_b"] = jnp.zeros((ch,), dtype)
    params["conv_out"] = conv(ch, 2 * cfg.latent_channels)
    return params


def _conv2d(x, p, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding="SAME" if stride == 1 else [(0, 1), (0, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"].astype(
        x.dtype)


def _group_norm(x, scale, bias, groups, eps=1e-6):
    n, h, w, c = x.shape
    g = min(groups, c)
    while c % g:
        g -= 1
    xf = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, h, w, c)
    return (xf * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _resnet(x, p, groups):
    h = _group_norm(x, p["n1"], p["n1b"], groups)
    h = _conv2d(jax.nn.silu(h), p["c1"])
    h = _group_norm(h, p["n2"], p["n2b"], groups)
    h = _conv2d(jax.nn.silu(h), p["c2"])
    skip = _conv2d(x, p["skip"]) if "skip" in p else x
    return skip + h


@dataclasses.dataclass(frozen=True)
class CausalVAE3DConfig:
    """Mochi-style causal-3D encoder (reference instantiates
    ``AutoencoderKLMochi`` from config, modeling_qwen2_vl_vae.py:
    121-143).  Frame t's latents depend only on input frames <= t:
    every temporal conv left-pads (kt-1) replicated first frames and
    group norm is computed PER FRAME (like Mochi's chunked group norm),
    so no operation mixes future into past.  Temporal downsampling is a
    strided causal conv with per-level strides ``temporal_expansions``
    (Mochi's name for its per-level temporal compression factors)."""

    in_channels: int = 3
    base_channels: int = 64
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)
    layers_per_block: int = 2
    temporal_expansions: Tuple[int, ...] = (1, 2, 3)
    latent_channels: int = 12
    groups: int = 32

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.channel_mults) - 1)

    @property
    def temporal_factor(self) -> int:
        f = 1
        for e in self.temporal_expansions[:len(self.channel_mults) - 1]:
            f *= e
        return f

    def level_t_stride(self, level: int) -> int:
        te = self.temporal_expansions
        return te[level] if level < len(te) else 1


def init_vae_encoder_3d(cfg: CausalVAE3DConfig, key,
                        dtype=jnp.float32):
    keys = iter(jax.random.split(key, 256))
    c0 = cfg.base_channels

    def conv(cin, cout, k=3, kt=3):
        return {"w": _conv_init_3d(next(keys), kt, k, k, cin, cout,
                                   dtype),
                "b": jnp.zeros((cout,), dtype)}

    def resnet(cin, cout):
        p = {
            "n1": jnp.ones((cin,), dtype),
            "n1b": jnp.zeros((cin,), dtype),
            "c1": conv(cin, cout),
            "n2": jnp.ones((cout,), dtype),
            "n2b": jnp.zeros((cout,), dtype),
            "c2": conv(cout, cout),
        }
        if cin != cout:
            p["skip"] = conv(cin, cout, k=1, kt=1)
        return p

    params = {"conv_in": conv(cfg.in_channels, c0), "down": []}
    ch = c0
    for li, mult in enumerate(cfg.channel_mults):
        out_ch = c0 * mult
        level = {"resnets": []}
        for _ in range(cfg.layers_per_block):
            level["resnets"].append(resnet(ch, out_ch))
            ch = out_ch
        if li < len(cfg.channel_mults) - 1:
            level["downsample"] = conv(ch, ch)
        params["down"].append(level)
    params["mid1"] = resnet(ch, ch)
    params["mid2"] = resnet(ch, ch)
    params["norm_out"] = jnp.ones((ch,), dtype)
    params["norm_out_b"] = jnp.zeros((ch,), dtype)
    params["conv_out"] = conv(ch, 2 * cfg.latent_channels)
    return params


def _conv_init_3d(key, kt, kh, kw, cin, cout, dtype):
    fan_in = kt * kh * kw * cin
    w = jax.random.normal(key, (kt, kh, kw, cin, cout), jnp.float32)
    return (w * (2.0 / fan_in) ** 0.5).astype(dtype)


def _causal_conv3d(x, p, t_stride=1, s_stride=1):
    """x [N, T, H, W, C]; temporal axis left-padded with replicated
    first frames, so output frame j sees input frames <= j*t_stride
    only.  Spatial padding matches the 2-D path."""
    kt = p["w"].shape[0]
    if kt > 1:
        x = jnp.pad(x, ((0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)),
                    mode="edge")
    ks = p["w"].shape[1]
    sp = (0, 1) if s_stride > 1 else (ks // 2, ks // 2)
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(t_stride, s_stride, s_stride),
        padding=[(0, 0), sp, sp],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p[
        "b"].astype(x.dtype)


def _group_norm_per_frame(x, scale, bias, groups, eps=1e-6):
    """Group norm with statistics per (batch, frame) — time-independent
    normalization preserves causality (Mochi's chunked group norm)."""
    n, t, h, w, c = x.shape
    y = _group_norm(x.reshape(n * t, h, w, c), scale, bias, groups,
                    eps)
    return y.reshape(n, t, h, w, c)


def _resnet3d(x, p, groups):
    h = _group_norm_per_frame(x, p["n1"], p["n1b"], groups)
    h = _causal_conv3d(jax.nn.silu(h), p["c1"])
    h = _group_norm_per_frame(h, p["n2"], p["n2b"], groups)
    h = _causal_conv3d(jax.nn.silu(h), p["c2"])
    skip = _causal_conv3d(x, p["skip"]) if "skip" in p else x
    return skip + h


def encode_3d(params, cfg: CausalVAE3DConfig, pixels: jax.Array,
              sample_key=None) -> jax.Array:
    """pixels [N, T, C, H, W] in [-1, 1] -> latents
    [N, T', Cl, H/f, W/f] with T' = (T-1)//ft + 1 per composed level
    stride (ft = cfg.temporal_factor; use T = 1 + k*ft so the last
    frame lands exactly on a latent frame — the same contract as
    Mochi's (T-1)/6 + 1 latent frame count).

    Causal: latent frame j depends only on input frames <= j*ft
    (tested by single-frame perturbation,
    tests/test_experimental_variants.py)."""
    x = pixels.transpose(0, 1, 3, 4, 2)  # NTHWC
    x = _causal_conv3d(x, params["conv_in"])
    for li, level in enumerate(params["down"]):
        for rp in level["resnets"]:
            x = _resnet3d(x, rp, cfg.groups)
        if "downsample" in level:
            x = _causal_conv3d(x, level["downsample"],
                               t_stride=cfg.level_t_stride(li),
                               s_stride=2)
    x = _resnet3d(x, params["mid1"], cfg.groups)
    x = _resnet3d(x, params["mid2"], cfg.groups)
    x = _group_norm_per_frame(x, params["norm_out"],
                              params["norm_out_b"], cfg.groups)
    x = _causal_conv3d(jax.nn.silu(x), params["conv_out"])
    mean, logvar = jnp.split(x, 2, axis=-1)
    if sample_key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30, 20))
        mean = mean + std * jax.random.normal(
            sample_key, mean.shape, mean.dtype)
    return mean.transpose(0, 1, 4, 2, 3)  # [N, T', Cl, H', W']


def encode(params, cfg: VAEEncoderConfig, pixels: jax.Array,
           sample_key=None) -> jax.Array:
    """pixels [N, C, H, W] in [-1, 1] -> latents [N, Cl, H/f, W/f].

    Deterministic (posterior mean) unless sample_key is given.
    """
    x = pixels.transpose(0, 2, 3, 1)  # NHWC for conv
    x = _conv2d(x, params["conv_in"])
    for level in params["down"]:
        for rp in level["resnets"]:
            x = _resnet(x, rp, cfg.groups)
        if "downsample" in level:
            x = _conv2d(x, level["downsample"], stride=2)
    x = _resnet(x, params["mid1"], cfg.groups)
    x = _resnet(x, params["mid2"], cfg.groups)
    x = _group_norm(x, params["norm_out"], params["norm_out_b"],
                    cfg.groups)
    x = _conv2d(jax.nn.silu(x), params["conv_out"])
    mean, logvar = jnp.split(x, 2, axis=-1)
    if sample_key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30, 20))
        mean = mean + std * jax.random.normal(
            sample_key, mean.shape, mean.dtype)
    return mean.transpose(0, 3, 1, 2)  # back to NCHW latents
