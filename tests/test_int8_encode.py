"""W8A8 int8 serving encoder: numerically close to the bf16 path
(cosine similarity) — the configuration that exploits the v5e's 2x
int8 MXU rate for the encode-throughput target."""

import numpy as np

import jax
import jax.numpy as jnp

from mantis_tpu.models import vit
from mantis_tpu.models.configs import VisionConfig


def test_int8_encoder_close_to_bf16():
    cfg = VisionConfig(
        tower_type="siglip", hidden_size=128, intermediate_size=256,
        num_hidden_layers=4, num_attention_heads=4, image_size=56,
        patch_size=14, layer_norm_eps=1e-6)
    params = vit.init_params(cfg, jax.random.PRNGKey(0),
                             dtype=jnp.float32)
    q8 = vit.quantize_encoder_weights_int8(params)
    rng = np.random.RandomState(0)
    pix = jnp.asarray(rng.randn(2, 3, 56, 56), jnp.float32)
    x = vit.embed(params, cfg, pix)
    ref = np.asarray(vit.encoder(params, cfg, x), np.float64)
    out = np.asarray(vit.encoder_int8(q8, cfg, x), np.float64)
    cos = (ref * out).sum() / (
        np.linalg.norm(ref) * np.linalg.norm(out) + 1e-9)
    assert cos > 0.999, cos
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.05, rel
