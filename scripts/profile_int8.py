"""Where does the W8A8 encode spend time? (attention share decides
whether an int8-attention kernel can reach the 250 img/s bar)"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from mantis_tpu.models import vit
from mantis_tpu.models.configs import VisionConfig

CFG = VisionConfig(
    tower_type="siglip", hidden_size=1152, intermediate_size=4304,
    num_hidden_layers=27, num_attention_heads=16, image_size=384,
    patch_size=14, layer_norm_eps=1e-6)
BATCH, N = 64, 6
params = vit.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
q8 = jax.jit(vit.quantize_encoder_weights_int8)(params)
jax.block_until_ready(q8)
rng = np.random.RandomState(0)
pix = [jnp.asarray(rng.randn(BATCH, 3, 384, 384) * 0.1, jnp.bfloat16)
       for _ in range(N + 1)]

def run(name, fn):
    f = jax.jit(fn)
    float(jnp.sum(f(q8, params, pix[-1]).astype(jnp.float32)))  # compile
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(N):
        acc += float(jnp.sum(f(q8, params, pix[i]).astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / N
    print(f"{name:28s} {dt*1000:8.1f} ms/batch  "
          f"{BATCH/dt:7.1f} img/s   (acc {acc:.2f})")
    return dt

full = run("int8 full",
           lambda q8_, p_, x: vit.encoder_int8(
               q8_, CFG, vit.embed(p_, CFG, x), num_layers=26))

# attention replaced by v passthrough (cost of everything else)
import mantis_tpu.models.vit as V
def encoder_noattn(q8, params, x):
    xx = vit.embed(params, CFG, x)
    n, s_in, d = xx.shape
    hh, dh = CFG.num_attention_heads, CFG.head_dim
    act = V.gelu_tanh
    s = ((s_in + 127) // 128) * 128
    xx = jnp.pad(xx, ((0, 0), (0, s - s_in), (0, 0)))
    layers = jax.tree.map(lambda a: a[:26], q8["layers"])
    def layer_fn(carry, lp):
        h = carry
        residual = h
        z = V.layer_norm(h, lp["ln1_scale"], lp["ln1_bias"], 1e-6)
        q = V._int8_linear(z, lp["q_q8"], lp["q_s8"], lp["q_b"])
        k = V._int8_linear(z, lp["k_q8"], lp["k_s8"], lp["k_b"])
        v = V._int8_linear(z, lp["v_q8"], lp["v_s8"], lp["v_b"])
        a = q * 0 + k * 0 + v
        h = residual + V._int8_linear(a, lp["o_q8"], lp["o_s8"],
                                      lp["o_b"])
        residual = h
        z = V.layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], 1e-6)
        z = V._int8_linear(act(V._int8_linear(z, lp["fc1_q8"],
                                              lp["fc1_s8"],
                                              lp["fc1_b"])),
                           lp["fc2_q8"], lp["fc2_s8"], lp["fc2_b"])
        return residual + z, None
    out, _ = jax.lax.scan(layer_fn, xx, layers)
    return out

noattn = run("int8 no-attention", encoder_noattn)
print(f"attention share: {(full - noattn)*1000:.1f} ms/batch "
      f"({(full - noattn)/26*1000:.2f} ms/layer)")
