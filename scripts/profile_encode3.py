"""Fine in-context ablations: what exactly costs 8.7ms/layer around
attention."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from mantis_tpu.models import vit
from mantis_tpu.models.configs import VisionConfig
from mantis_tpu.ops.flash_attention import (
    flash_attention, _flash_attention_core)

CFG = VisionConfig(
    tower_type="siglip", hidden_size=1152, intermediate_size=4304,
    num_hidden_layers=27, num_attention_heads=16, image_size=384,
    patch_size=14, layer_norm_eps=1e-6)
BATCH, N = 64, 6
params = vit.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
embedded = [jnp.asarray(np.pad(rng.randn(BATCH, 729, 1152), ((0,0),(0,39),(0,0))), jnp.bfloat16) for _ in range(N + 1)]

def run(name, attn_mode):
    def encoder(p, x):
        n, s, d = x.shape
        hh, dh = 16, 72
        scale = dh ** -0.5
        layers = jax.tree.map(lambda a: a[:26], p["layers"])
        def layer_fn(carry, lp):
            h = carry
            residual = h
            x = vit.layer_norm(h, lp["ln1_scale"], lp["ln1_bias"], 1e-6)
            q = (x @ lp["q"] + lp["q_b"]).reshape(n, s, hh, dh)
            k = (x @ lp["k"] + lp["k_b"]).reshape(n, s, hh, dh)
            v = (x @ lp["v"] + lp["v_b"]).reshape(n, s, hh, dh)
            if attn_mode == "full":
                a = flash_attention(q, k, v, causal=False,
                                    softmax_scale=scale)
            elif attn_mode == "transpose_only":
                a = (q.transpose(0,2,1,3) + k.transpose(0,2,1,3)
                     + v.transpose(0,2,1,3)).transpose(0,2,1,3)
            elif attn_mode == "kernel_bhsd":
                # kernel on pre-transposed operands, measured with
                # transposes hidden (same graph as full, split)
                qt = q.transpose(0,2,1,3); kt = k.transpose(0,2,1,3)
                vt = v.transpose(0,2,1,3)
                qseg = jnp.zeros((n, s), jnp.int32)
                a = _flash_attention_core(
                    qt, kt, vt, qseg, qseg, scale, False, False,
                    768, 768, False, None, None).transpose(0,2,1,3)
            elif attn_mode == "none":
                a = v
            h = residual + (a.reshape(n, s, d) @ lp["o"] + lp["o_b"])
            residual = h
            x = vit.layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], 1e-6)
            x = vit.gelu_tanh(x @ lp["fc1"] + lp["fc1_b"]) @ lp["fc2"] \
                + lp["fc2_b"]
            return residual + x, None
        x, _ = jax.lax.scan(layer_fn, x, layers)
        return x
    f = jax.jit(encoder)
    float(jnp.sum(f(params, embedded[-1]).astype(jnp.float32)))
    t0 = time.perf_counter()
    acc = 0.0
    for x in embedded[:N]:
        acc = acc + jnp.sum(f(params, x).astype(jnp.float32))
    float(acc)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:28s} {dt*1000:7.1f} ms/batch {BATCH/dt:7.1f} img/s")

run("attn none", "none")
run("transposes only", "transpose_only")
run("kernel (incl transposes)", "kernel_bhsd")
run("full flash_attention", "full")
