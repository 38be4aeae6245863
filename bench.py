"""Benchmark entry: prints ONE JSON line for the driver.

Round-1 metric: SigLIP-so400m image-encode throughput (images/sec/chip),
the driver target "≥2× A100 images/sec encoded per chip".  The reference
encodes eval images through the HF SigLIP tower with micro-batch 2
(reference: mantis/models/mllava/modeling_llava.py:437-441); an A100-80G
at that setting sustains roughly 200 img/s (312 TFLOP/s peak at ~40% MFU
over ~0.62 TFLOP/image), so the 2x-A100 bar is ~400 img/s:
vs_baseline = value / 400.

Measurement notes (axon tunnel): repeated identical executions are
result-cached remotely and per-call round-trips cost ~5 ms, so every
timed call uses a DISTINCT pre-staged input batch, carries >=100 ms of
compute, and the run is synced once via a lazily-accumulated scalar.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from mantis_tpu.models import vit
    from mantis_tpu.models.configs import VisionConfig

    cfg = VisionConfig(
        tower_type="siglip", hidden_size=1152, intermediate_size=4304,
        num_hidden_layers=27, num_attention_heads=16, image_size=384,
        patch_size=14, layer_norm_eps=1e-6)
    params = vit.init_params(cfg, jax.random.PRNGKey(0),
                             dtype=jnp.bfloat16)

    batch, n_calls = 64, 8
    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(batch, 3, 384, 384), jnp.bfloat16)
               for _ in range(n_calls + 1)]

    @jax.jit
    def encode(params, pix):
        # full eval feature path: hidden_states[-2] tap like Mantis eval
        feats = vit.forward(params, cfg, pix,
                            num_layers=cfg.num_hidden_layers - 1)
        return jnp.sum(feats.astype(jnp.float32))

    float(encode(params, batches[-1]))  # compile + warm (distinct input)

    t0 = time.perf_counter()
    acc = 0.0
    for pix in batches[:n_calls]:
        acc = acc + encode(params, pix)
    float(acc)  # single sync
    dt = time.perf_counter() - t0
    imgs_per_sec = batch * n_calls / dt

    print(json.dumps({
        "metric": "siglip_so400m_encode_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / 400.0, 3),
    }))


if __name__ == "__main__":
    main()
