"""Ablation profile of the SigLIP encode path on the real TPU.

Times variants of the encoder to find where the 148 img/s -> ~280 img/s
(sustained-SOL) gap lives.  Axon rules: distinct inputs per timed call,
one trailing sync.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mantis_tpu.models import vit
from mantis_tpu.models.configs import VisionConfig
from mantis_tpu.ops.flash_attention import flash_attention, mha_reference

CFG = VisionConfig(
    tower_type="siglip", hidden_size=1152, intermediate_size=4304,
    num_hidden_layers=27, num_attention_heads=16, image_size=384,
    patch_size=14, layer_norm_eps=1e-6)
BATCH = 64
N_CALLS = 6


def timed(name, fn, params, batches):
    f = jax.jit(fn)
    float(jnp.sum(f(params, batches[-1]).astype(jnp.float32)))  # compile
    t0 = time.perf_counter()
    acc = 0.0
    for pix in batches[:N_CALLS]:
        acc = acc + jnp.sum(f(params, pix).astype(jnp.float32))
    float(acc)
    dt = time.perf_counter() - t0
    ips = BATCH * N_CALLS / dt
    print(f"{name:36s} {dt / N_CALLS * 1000:8.1f} ms/batch "
          f"{ips:7.1f} img/s")
    return dt / N_CALLS


def encoder_variant(params, x, *, attn="pallas", mlp=True, ln=True,
                    fused_qkv=False, num_layers=26):
    cfg = CFG
    n, s, d = x.shape
    hh, dh = cfg.num_attention_heads, cfg.head_dim
    scale = dh ** -0.5
    layers = jax.tree.map(lambda a: a[:num_layers], params["layers"])
    if fused_qkv:
        layers = dict(layers)
        layers["qkv"] = jnp.concatenate(
            [layers["q"], layers["k"], layers["v"]], axis=-1)
        layers["qkv_b"] = jnp.concatenate(
            [layers["q_b"], layers["k_b"], layers["v_b"]], axis=-1)

    def layer_fn(carry, lp):
        h = carry
        residual = h
        x = vit.layer_norm(h, lp["ln1_scale"], lp["ln1_bias"], 1e-6) \
            if ln else h
        if fused_qkv:
            qkv = (x @ lp["qkv"] + lp["qkv_b"]).reshape(n, s, 3, hh, dh)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        else:
            q = (x @ lp["q"] + lp["q_b"]).reshape(n, s, hh, dh)
            k = (x @ lp["k"] + lp["k_b"]).reshape(n, s, hh, dh)
            v = (x @ lp["v"] + lp["v_b"]).reshape(n, s, hh, dh)
        if attn == "pallas":
            a = flash_attention(q, k, v, causal=False,
                                softmax_scale=scale)
        elif attn == "xla":
            a = mha_reference(q, k, v, causal=False, softmax_scale=scale)
        elif attn == "none":
            a = v
        a = a.reshape(n, s, d)
        h = residual + (a @ lp["o"] + lp["o_b"])
        residual = h
        if mlp:
            x = vit.layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], 1e-6) \
                if ln else h
            x = vit.gelu_tanh(x @ lp["fc1"] + lp["fc1_b"]) \
                @ lp["fc2"] + lp["fc2_b"]
            h = residual + x
        return h, None

    x, _ = jax.lax.scan(layer_fn, x, layers)
    return x


def main():
    params = vit.init_params(CFG, jax.random.PRNGKey(0),
                             dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(BATCH, 3, 384, 384), jnp.bfloat16)
               for _ in range(N_CALLS + 1)]
    embedded = [jax.block_until_ready(jax.jit(
        functools.partial(vit.embed, params, CFG))(b)) for b in batches]

    timed("full current (pallas attn)",
          lambda p, b: vit.forward(p, CFG, b, num_layers=26),
          params, batches)
    timed("embed only",
          lambda p, b: vit.embed(p, CFG, b), params, batches)
    timed("encoder current",
          lambda p, x: encoder_variant(p, x), params, embedded)
    timed("encoder xla-attn",
          lambda p, x: encoder_variant(p, x, attn="xla"),
          params, embedded)
    timed("encoder no-attn (v pass-through)",
          lambda p, x: encoder_variant(p, x, attn="none"),
          params, embedded)
    timed("encoder no-mlp",
          lambda p, x: encoder_variant(p, x, mlp=False),
          params, embedded)
    timed("encoder no-layernorm",
          lambda p, x: encoder_variant(p, x, ln=False),
          params, embedded)
    timed("encoder fused-qkv",
          lambda p, x: encoder_variant(p, x, fused_qkv=True),
          params, embedded)
    timed("encoder fused-qkv xla-attn",
          lambda p, x: encoder_variant(p, x, fused_qkv=True, attn="xla"),
          params, embedded)


def xla_fast_attention(q, k, v, scale):
    # bf16 MXU matmuls, f32 softmax; no HIGHEST-precision passes
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def main2():
    params = vit.init_params(CFG, jax.random.PRNGKey(0),
                             dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(BATCH, 3, 384, 384), jnp.bfloat16)
               for _ in range(N_CALLS + 1)]
    embedded = [jax.block_until_ready(jax.jit(
        functools.partial(vit.embed, params, CFG))(b)) for b in batches]

    def enc_fast(p, x, attn_fn):
        cfg = CFG
        n, s, d = x.shape
        hh, dh = cfg.num_attention_heads, cfg.head_dim
        scale = dh ** -0.5
        layers = jax.tree.map(lambda a: a[:26], p["layers"])

        def layer_fn(carry, lp):
            h = carry
            residual = h
            x = vit.layer_norm(h, lp["ln1_scale"], lp["ln1_bias"], 1e-6)
            q = (x @ lp["q"] + lp["q_b"]).reshape(n, s, hh, dh)
            k = (x @ lp["k"] + lp["k_b"]).reshape(n, s, hh, dh)
            v = (x @ lp["v"] + lp["v_b"]).reshape(n, s, hh, dh)
            a = attn_fn(q, k, v, scale).reshape(n, s, d)
            h = residual + (a @ lp["o"] + lp["o_b"])
            residual = h
            x = vit.layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], 1e-6)
            x = vit.gelu_tanh(x @ lp["fc1"] + lp["fc1_b"]) \
                @ lp["fc2"] + lp["fc2_b"]
            return residual + x, None

        x, _ = jax.lax.scan(layer_fn, x, layers)
        return x

    timed("encoder xla-FAST-attn",
          lambda p, x: enc_fast(p, x, xla_fast_attention),
          params, embedded)

    # standalone attention op at encoder shapes, 26 reps
    qkv = [tuple(jnp.asarray(rng.randn(BATCH, 729, 16, 72), jnp.bfloat16)
                 for _ in range(3)) for _ in range(N_CALLS + 1)]

    def attn_only(fn, name):
        @jax.jit
        def f(q, k, v):
            def body(c, _):
                return c + fn(q, k, v, 72 ** -0.5).astype(jnp.float32), None
            acc, _ = jax.lax.scan(
                body, jnp.zeros(q.shape, jnp.float32), None, length=26)
            return jnp.sum(acc)
        float(f(*qkv[-1]))
        t0 = time.perf_counter()
        acc = 0.0
        for t in qkv[:N_CALLS]:
            acc = acc + f(*t)
        float(acc)
        dt = (time.perf_counter() - t0) / N_CALLS
        print(f"{name:36s} {dt * 1000:8.1f} ms/26-layers")

    attn_only(xla_fast_attention, "attn-only xla-fast")
    attn_only(lambda q, k, v, s: flash_attention(
        q, k, v, causal=False, softmax_scale=s), "attn-only pallas")


if __name__ == "__main__":
    main()
