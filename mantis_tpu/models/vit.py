"""CLIP / SigLIP vision transformers in functional JAX.

TPU-native replacement for the reference's HF vision towers
(reference: mantis/models/mllava/modeling_llava.py:254 uses
``AutoModel.from_config(config.vision_config)`` -> CLIP/SigLIP ViT).

- Patch embedding runs as a reshape + matmul (stride==kernel convolution),
  which maps straight onto the MXU instead of a conv op.
- Encoder layers are scan-stacked like the LLaMA decoder.
- ``encode_images`` reproduces the reference's hidden_states[-2] feature
  tap (reference: modeling_llava.py:442-447): for feature layer -k, only
  the first L+1-k encoder layers run at all.
"""

from __future__ import annotations

from typing import Optional

import einops
import jax
import jax.numpy as jnp

from mantis_tpu.models.configs import VisionConfig
from mantis_tpu.ops.flash_attention import flash_attention, mha_reference
from mantis_tpu.ops.remat import remat


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def layer_norm(x, scale, bias, eps):
    # NOTE: a Pallas fused LN exists (ops/fused_norm.py) but measured
    # SLOWER in context (184.8 -> 174.1 img/s on the SigLIP encode):
    # XLA already fuses this LN with the adjacent bias-add/residual, and
    # an opaque pallas_call breaks that fusion.  Keep the jnp form.
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf.astype(dtype) * scale + bias).astype(dtype)


def init_params(cfg: VisionConfig, key: jax.Array, dtype=jnp.float32):
    d, li, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    p = cfg.patch_size
    keys = jax.random.split(key, 12)

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    params = {
        "patch_embedding": norm(keys[0], (cfg.num_channels * p * p, d)),
        "position_embedding": norm(keys[1], (cfg.num_positions, d)),
        "layers": {
            "ln1_scale": jnp.ones((L, d), dtype),
            "ln1_bias": jnp.zeros((L, d), dtype),
            "q": norm(keys[2], (L, d, d)), "q_b": jnp.zeros((L, d), dtype),
            "k": norm(keys[3], (L, d, d)), "k_b": jnp.zeros((L, d), dtype),
            "v": norm(keys[4], (L, d, d)), "v_b": jnp.zeros((L, d), dtype),
            "o": norm(keys[5], (L, d, d)), "o_b": jnp.zeros((L, d), dtype),
            "ln2_scale": jnp.ones((L, d), dtype),
            "ln2_bias": jnp.zeros((L, d), dtype),
            "fc1": norm(keys[6], (L, d, li)),
            "fc1_b": jnp.zeros((L, li), dtype),
            "fc2": norm(keys[7], (L, li, d)),
            "fc2_b": jnp.zeros((L, d), dtype),
        },
        "post_ln_scale": jnp.ones((d,), dtype),
        "post_ln_bias": jnp.zeros((d,), dtype),
    }
    if cfg.tower_type == "clip":
        params["class_embedding"] = norm(keys[8], (d,))
        params["pre_ln_scale"] = jnp.ones((d,), dtype)
        params["pre_ln_bias"] = jnp.zeros((d,), dtype)
    else:
        params["patch_bias"] = jnp.zeros((d,), dtype)
    return params


def embed_patches_only(params, cfg: VisionConfig,
                       pixel_values: jax.Array) -> jax.Array:
    """Patchify + linear embed (+bias), no class token / positions.
    pixel_values: [N, C, H, W] -> [N, P, D]."""
    p = cfg.patch_size
    # 'valid' conv semantics: trailing pixels that don't fill a whole
    # patch are dropped (e.g. SigLIP so400m 384px / patch14 -> 27x27).
    hh = pixel_values.shape[2] // p
    ww = pixel_values.shape[3] // p
    pixel_values = pixel_values[:, :, :hh * p, :ww * p]
    patches = einops.rearrange(
        pixel_values, "n c (hh p1) (ww p2) -> n (hh ww) (c p1 p2)",
        p1=p, p2=p)
    x = patches.astype(params["patch_embedding"].dtype) @ params[
        "patch_embedding"]
    if "patch_bias" in params:
        x = x + params["patch_bias"]
    return x


def embed(params, cfg: VisionConfig, pixel_values: jax.Array) -> jax.Array:
    """pixel_values: [N, C, H, W] (torch layout) -> [N, P(+1), D]."""
    x = embed_patches_only(params, cfg, pixel_values)
    if cfg.tower_type == "siglip":
        x = x + params["position_embedding"][None]
    else:
        cls = jnp.broadcast_to(
            params["class_embedding"][None, None, :],
            (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["position_embedding"][None]
    return x


def encoder(
    params,
    cfg: VisionConfig,
    x: jax.Array,
    *,
    segment_ids: Optional[jax.Array] = None,
    num_layers: Optional[int] = None,
    attn_impl: Optional[str] = None,
    use_remat: bool = False,
) -> jax.Array:
    """Run the encoder stack over embedded tokens [N, S, D].

    segment_ids (optional, [N, S]) mask padded patch tokens (NaViT
    variable-aspect images, Idefics2)."""
    n, s_in, d = x.shape
    h_heads, dh = cfg.num_attention_heads, cfg.head_dim
    act = quick_gelu if cfg.tower_type == "clip" else gelu_tanh
    scale = dh ** -0.5

    # Pad the sequence to the TPU-friendly 128 multiple ONCE for the
    # whole stack (instead of inside every flash_attention call) and
    # mask the pad keys with a static kv boundary: measured +10% encode
    # throughput at S=729 (729 rows tile like 768 on the MXU anyway).
    kv_valid = None
    s = ((s_in + 127) // 128) * 128
    if attn_impl == "xla":
        s = s_in  # reference path has no static-kv mask
    if s != s_in and segment_ids is None:
        x = jnp.pad(x, ((0, 0), (0, s - s_in), (0, 0)))
        kv_valid = s_in
    else:
        s = s_in

    L = cfg.num_hidden_layers
    if num_layers is None:
        num_layers = L
    layers = jax.tree.map(lambda a: a[:num_layers], params["layers"])

    def layer_fn(carry, lp):
        h = carry
        residual = h
        x = layer_norm(h, lp["ln1_scale"], lp["ln1_bias"], cfg.layer_norm_eps)
        q = (x @ lp["q"] + lp["q_b"]).reshape(n, s, h_heads, dh)
        k = (x @ lp["k"] + lp["k_b"]).reshape(n, s, h_heads, dh)
        v = (x @ lp["v"] + lp["v_b"]).reshape(n, s, h_heads, dh)
        if attn_impl == "xla":
            attn = mha_reference(q, k, v, causal=False,
                                 segment_ids=segment_ids,
                                 softmax_scale=scale)
        else:
            attn = flash_attention(q, k, v, causal=False,
                                   segment_ids=segment_ids,
                                   softmax_scale=scale,
                                   kv_valid_len=kv_valid,
                                   implementation=attn_impl)
        attn = attn.reshape(n, s, d)
        h = residual + (attn @ lp["o"] + lp["o_b"])
        residual = h
        x = layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], cfg.layer_norm_eps)
        x = act(x @ lp["fc1"] + lp["fc1_b"]) @ lp["fc2"] + lp["fc2_b"]
        return residual + x, None

    layer_fn = remat(layer_fn, use_remat)
    x, _ = jax.lax.scan(layer_fn, x, layers)
    if s != s_in:
        x = x[:, :s_in]
    return x


def forward(
    params,
    cfg: VisionConfig,
    pixel_values: jax.Array,
    *,
    num_layers: Optional[int] = None,
    attn_impl: Optional[str] = None,
    use_remat: bool = False,
) -> jax.Array:
    """Embed + encoder; returns hidden states after `num_layers` layers
    (default: all), without post-layernorm."""
    x = embed(params, cfg, pixel_values)
    if cfg.tower_type == "clip":
        x = layer_norm(x, params["pre_ln_scale"], params["pre_ln_bias"],
                       cfg.layer_norm_eps)
    return encoder(params, cfg, x, num_layers=num_layers,
                   attn_impl=attn_impl, use_remat=use_remat)


def encode_images(
    params,
    cfg: VisionConfig,
    pixel_values: jax.Array,
    *,
    vision_feature_layer: int = -2,
    vision_feature_select_strategy: str = "default",
    attn_impl: Optional[str] = None,
    use_remat: bool = False,
) -> jax.Array:
    """Feature tap matching the reference (modeling_llava.py:442-451).

    hidden_states[i] in HF is the input to layer i; index -k therefore
    corresponds to running L+1-k layers.  Only those layers execute.
    """
    L = cfg.num_hidden_layers
    fl = vision_feature_layer
    num_layers = fl if fl >= 0 else L + 1 + fl
    feats = forward(params, cfg, pixel_values, num_layers=num_layers,
                    attn_impl=attn_impl, use_remat=use_remat)
    if vision_feature_select_strategy == "default":
        # The reference drops index 0 unconditionally — including for
        # SigLIP, which has no class token (modeling_llava.py:444-445);
        # match that behavior exactly.
        feats = feats[:, 1:]
    elif vision_feature_select_strategy != "full":
        raise ValueError(
            f"Unexpected select strategy: {vision_feature_select_strategy}")
    return feats


# ---------------------------------------------------------------------------
# int8 serving encode (W8A8 dynamic) — v5e int8 MXU runs ~2x bf16
# ---------------------------------------------------------------------------

def quantize_encoder_weights_int8(params):
    """Per-output-channel symmetric int8 for the encoder matmuls.

    Returns a params copy where each layer matmul weight W [.., K, N]
    becomes (w_q int8, w_scale f32[1, N]).  Embedding/layernorm stay
    bf16.  Serving-only: accuracy is the caller's responsibility
    (cosine > 0.999 vs bf16 on random inputs, see tests).
    """
    out = {k: v for k, v in params.items()}
    layers = dict(params["layers"])
    for name in ("q", "k", "v", "o", "fc1", "fc2"):
        w = layers[name].astype(jnp.float32)          # [L, K, N]
        s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
        s = jnp.where(s == 0, 1.0, s)
        layers[name + "_q8"] = jnp.clip(
            jnp.round(w / s), -127, 127).astype(jnp.int8)
        layers[name + "_s8"] = s
        del layers[name]
    out["layers"] = layers
    return out


def _int8_linear(x, w_q, w_s, bias):
    """Dynamic per-row activation quant + int8 MXU matmul + rescale."""
    import jax
    xs = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    xs = jnp.where(xs == 0, 1.0, xs)
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * w_s
    return (y + bias).astype(x.dtype)


def encoder_int8(params_q8, cfg: VisionConfig, x, *,
                 num_layers: Optional[int] = None):
    """Encoder stack with W8A8 matmuls (serving path; attention stays
    bf16 flash).  params_q8 from quantize_encoder_weights_int8."""
    n, s_in, d = x.shape
    hh, dh = cfg.num_attention_heads, cfg.head_dim
    act = quick_gelu if cfg.tower_type == "clip" else gelu_tanh
    scale = dh ** -0.5
    kv_valid = None
    s = ((s_in + 127) // 128) * 128
    if s != s_in:
        x = jnp.pad(x, ((0, 0), (0, s - s_in), (0, 0)))
        kv_valid = s_in
    L = cfg.num_hidden_layers if num_layers is None else num_layers
    layers = jax.tree.map(lambda a: a[:L], params_q8["layers"])

    def layer_fn(carry, lp):
        h = carry
        residual = h
        xx = layer_norm(h, lp["ln1_scale"], lp["ln1_bias"],
                        cfg.layer_norm_eps)
        q = _int8_linear(xx, lp["q_q8"], lp["q_s8"], lp["q_b"]).reshape(
            n, s, hh, dh)
        k = _int8_linear(xx, lp["k_q8"], lp["k_s8"], lp["k_b"]).reshape(
            n, s, hh, dh)
        v = _int8_linear(xx, lp["v_q8"], lp["v_s8"], lp["v_b"]).reshape(
            n, s, hh, dh)
        attn = flash_attention(q, k, v, causal=False,
                               softmax_scale=scale,
                               kv_valid_len=kv_valid)
        h = residual + _int8_linear(attn.reshape(n, s, d), lp["o_q8"],
                                    lp["o_s8"], lp["o_b"])
        residual = h
        xx = layer_norm(h, lp["ln2_scale"], lp["ln2_bias"],
                        cfg.layer_norm_eps)
        xx = _int8_linear(act(_int8_linear(xx, lp["fc1_q8"],
                                           lp["fc1_s8"], lp["fc1_b"])),
                          lp["fc2_q8"], lp["fc2_s8"], lp["fc2_b"])
        return residual + xx, None

    x, _ = jax.lax.scan(layer_fn, x, layers)
    if s != s_in:
        x = x[:, :s_in]
    return x
