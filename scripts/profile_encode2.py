"""Encoder timing with the sequence padded ONCE to 768 for the whole
stack (timing experiment; mask correctness handled in production via
kv_len)."""
import functools, sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from mantis_tpu.models import vit
from mantis_tpu.models.configs import VisionConfig
from mantis_tpu.ops.flash_attention import flash_attention

CFG = VisionConfig(
    tower_type="siglip", hidden_size=1152, intermediate_size=4304,
    num_hidden_layers=27, num_attention_heads=16, image_size=384,
    patch_size=14, layer_norm_eps=1e-6)
BATCH, N = 64, 6

params = vit.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
embedded = []
for i in range(N + 1):
    x = rng.randn(BATCH, 729, 1152).astype(np.float32)
    xp = np.zeros((BATCH, 768, 1152), np.float32)
    xp[:, :729] = x
    embedded.append(jnp.asarray(xp, jnp.bfloat16))

def encoder_768(p, x):
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
        a = flash_attention(q, k, v, causal=False, softmax_scale=scale)
        h = residual + (a.reshape(n, s, d) @ lp["o"] + lp["o_b"])
        residual = h
        x = vit.layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], 1e-6)
        x = vit.gelu_tanh(x @ lp["fc1"] + lp["fc1_b"]) @ lp["fc2"] \
            + lp["fc2_b"]
        return residual + x, None

    x, _ = jax.lax.scan(layer_fn, x, layers)
    return x

f = jax.jit(encoder_768)
float(jnp.sum(f(params, embedded[-1]).astype(jnp.float32)))
t0 = time.perf_counter()
acc = 0.0
for x in embedded[:N]:
    acc = acc + jnp.sum(f(params, x).astype(jnp.float32))
float(acc)
dt = (time.perf_counter() - t0) / N
print(f"encoder once-padded-768: {dt*1000:.1f} ms/batch "
      f"({BATCH/dt:.1f} img/s-equivalent)")
