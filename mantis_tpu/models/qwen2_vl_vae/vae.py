"""VAE encoder for the Qwen2-VL-VAE experimental family.

The reference instantiates a diffusers VAE by class name (reference:
mantis/models/qwen2_vl_vae/modeling_qwen2_vl_vae.py:121-143,
``AutoencoderKLMochi.from_config``) and feeds its latents into the
latent patchify path.  diffusers is not available in this image (it is
an optional dependency in the reference too), so this is a functional
JAX implementation of the standard AutoencoderKL ENCODER topology:
conv_in -> [ResnetBlock x N + stride-2 downsample] per level -> mid
resnets -> GroupNorm/SiLU -> conv_out -> (mean, logvar) -> latents.

Deviation from Mochi (documented): Mochi's encoder is causal-3D over
frames; here frames are encoded per-frame (2-D), matching how the rest
of this family treats videos as frame sequences.
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
