"""Honest multi-image SFT MFU measurement (VERDICT round-2 item 1).

The BASELINE target is ">=40% MFU for 8B multi-image SFT".  Round 2
measured a text-only depth-2/32k-vocab proxy; this script measures the
real workload on one 16 GB v5e:

  - pixel_values through the FROZEN 27-layer SigLIP-so400m tower
    (multi-image packed rows: 4 images x 729 tokens per 8192-token row,
    3 packed conversations per row),
  - flagship vocab 128,258 through chunked CE (ops/chunked_ce.py),
  - LM depth >= 8 at flagship widths (4096/14336, GQA 32/8),
  - remat policy "nothing" (the only one that fits depth 8 on 16 GB;
    "dots" is +7% where it fits, see docs/PERF.md).

Memory arithmetic forces a COMPOSED measurement for the full optimizer
step: trainable params at depth 8 are ~2.82 B, whose Adam moments do
not fit 16 GB next to params+activations in any dtype
(fp32: 22.5 GB, bf16: 11.3 GB on top of 6.5 GB params).  So:

  t_full(d8) = t_fwdbwd(d8)            [measured directly: grads are
                                        consumed into a global-norm
                                        scalar inside the jit]
             + t_adam(2.82B params)    [measured directly on synthetic
                                        slabs at 2+ sizes to confirm
                                        bandwidth-linearity, scaled]

and MFU = FLOPs(actual config incl. frozen-vision forward) / t_full /
197e12.  A directly-measured full real step (value_and_grad + clip +
adamw, donated state) at a depth that fits cross-checks the
composition.

Run sections selectively:  python scripts/bench_mfu_honest.py fb8 adam full4
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

PEAK_FLOPS = 197e12
B, S = 2, 8192
IMAGES_PER_ROW = 4
CHUNK = 1024


def make_cfg(depth):
    from mantis_tpu.models.configs import (
        LlamaConfig, LlavaConfig, VisionConfig)

    return LlavaConfig(
        vision_config=VisionConfig(
            tower_type="siglip", hidden_size=1152, intermediate_size=4304,
            num_hidden_layers=27, num_attention_heads=16, image_size=384,
            patch_size=14, layer_norm_eps=1e-6),
        text_config=LlamaConfig(
            vocab_size=128258, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=depth, num_attention_heads=32,
            num_key_value_heads=8, rope_theta=500000.0),
        image_token_index=128256,
    )


def make_batch(cfg, seed):
    """Multi-image packed SFT row: 3 conversations, 4 images, labels on
    assistant spans only (~50% of text), image positions masked."""
    rng = np.random.RandomState(seed)
    P = cfg.num_image_tokens  # 729
    ids = rng.randint(2, 128000, size=(B, S))
    seg = np.ones((B, S), np.int32)
    seg[:, S // 3: 2 * S // 3] = 2
    seg[:, 2 * S // 3:] = 3
    pos = np.concatenate([
        np.arange(S // 3), np.arange(S // 3), np.arange(S - 2 * (S // 3))])
    pos = np.broadcast_to(pos, (B, S)).copy()
    # 4 images per row: 2 in conv1, 1 in conv2, 1 in conv3
    starts = [8, 8 + P + 64, S // 3 + 8, 2 * (S // 3) + 8]
    for st in starts:
        ids[:, st:st + P] = cfg.image_token_index
    labels = ids.copy()
    is_img = ids == cfg.image_token_index
    labels[is_img] = -100
    # mask user halves of each conversation prefix
    for c0 in (0, S // 3, 2 * (S // 3)):
        labels[:, c0:c0 + (S // 6)] = np.where(
            is_img[:, c0:c0 + (S // 6)], -100, -100)
    pix = rng.randn(B * IMAGES_PER_ROW, 3, 384, 384).astype(np.float32)
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "segment_ids": jnp.asarray(seg),
        "positions": jnp.asarray(pos),
        "pixel_values": jnp.asarray(pix, jnp.bfloat16),
    }


def model_flops_per_step(cfg):
    """FLOPs actually executed per step (attention-score FLOPs omitted
    on both text and vision sides -> conservative MFU)."""
    t = cfg.text_config
    v = cfg.vision_config
    d, li, V = t.hidden_size, t.intermediate_size, t.vocab_size
    dh = d // t.num_attention_heads
    # canonical q+o + k+v + 3-matrix MLP accounting, pinned against the
    # real param tree (tests/test_trainer.py::test_mfu_flops_formula)
    from mantis_tpu.utils.profiling import llama_layer_matmul_params
    lm_layer_params = llama_layer_matmul_params(
        d, t.num_attention_heads, t.num_key_value_heads, li)
    n_tok = B * S
    # trainable LM: fwd+bwd = 6 FLOPs/param/token; head 6*d*V
    lm = 6 * (t.num_hidden_layers * lm_layer_params + d * V) * n_tok
    # frozen vision tower: forward only = 2 FLOPs/param/token
    n_img = B * IMAGES_PER_ROW
    pvit = cfg.num_image_tokens
    vit_layer_params = 4 * v.hidden_size ** 2 + 2 * v.hidden_size * \
        v.intermediate_size
    vit_layers_used = v.num_hidden_layers - 1  # feature tap at -2
    patch_embed = 3 * v.patch_size ** 2 * v.hidden_size
    vision = 2 * n_img * pvit * (
        vit_layers_used * vit_layer_params + patch_embed)
    # trainable projector: 6 FLOPs/param/img-token
    dp = v.hidden_size * d + d * d
    proj = 6 * n_img * pvit * dp
    return lm + vision + proj


def trainable_param_count(depth):
    cfg = make_cfg(depth)
    t = cfg.text_config
    d, li, V = t.hidden_size, t.intermediate_size, t.vocab_size
    dh = d // t.num_attention_heads
    per_layer = (d * 32 * dh + 2 * d * 8 * dh + d * 32 * dh + 3 * d * li
                 + 2 * d)
    proj = 1152 * d + d + d * d + d
    return depth * per_layer + 2 * d * V + d + proj


def build_fb_step(depth, remat="nothing"):
    from mantis_tpu.models.mllava import model as mllava_model
    from mantis_tpu.train import trainer as T

    cfg = make_cfg(depth)
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(0),
                                      dtype=jnp.bfloat16)
    trainable, frozen = T.partition_params(
        params, lambda p: T.default_trainable_pred(p, freeze_vision=True))

    # frozen params are a jit ARGUMENT: closing over the 0.86 GB tower
    # bakes it into the HLO as constants and the remote compile service
    # rejects the request (HTTP 413)
    def loss_fn(trainable, frozen, batch):
        full = T.combine_params(trainable, frozen)
        _, loss, _ = mllava_model.forward(
            full, cfg,
            input_ids=batch["input_ids"],
            pixel_values=batch["pixel_values"],
            positions=batch["positions"],
            segment_ids=batch["segment_ids"],
            labels=batch["labels"],
            use_remat=remat,
            loss_chunk_size=CHUNK)
        return loss

    @jax.jit
    def fb_jit(trainable, frozen, batch):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, frozen,
                                                  batch)
        # consume grads into a scalar INSIDE the jit: XLA frees each
        # grad tensor after its square-sum, so the full 2.8B-param grad
        # tree never co-resides.
        import optax
        return loss, optax.global_norm(grads)

    def fb_step(trainable_, batch):
        return fb_jit(trainable_, frozen, batch)

    return cfg, trainable, fb_step


def run_fb(depth, remat="nothing", n_calls=3):
    cfg, trainable, fb_step = build_fb_step(depth, remat)
    batches = [make_batch(cfg, i) for i in range(n_calls + 1)]
    t0 = time.perf_counter()
    l, g = fb_step(trainable, batches[-1])
    print(f"  compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={float(l):.3f} gnorm={float(g):.3f}")
    t0 = time.perf_counter()
    acc = 0.0
    for b in batches[:n_calls]:
        l, g = fb_step(trainable, b)
        acc += float(l)  # value fetch each call (conservative timing)
    dt = (time.perf_counter() - t0) / n_calls
    fl = model_flops_per_step(cfg)
    print(f"fb depth={depth} remat={remat}: {dt * 1000:.1f} ms/step, "
          f"flops={fl / 1e12:.1f}T, fb-only MFU={fl / dt / PEAK_FLOPS:.4f}")
    return dt


def run_adam_slabs():
    """AdamW+clip update cost on synthetic slabs: bandwidth-linear?"""
    import optax

    K = 4  # updates chained IN ONE JIT: amortizes the ~30 ms tunnel
           # dispatch that contaminated single-call timings

    def measure(n_params_m):
        n = n_params_m * 1_000_000
        shape = (n // 4096, 4096)
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adamw(1e-5))

        @jax.jit
        def init(key):
            p = jax.random.normal(key, shape, jnp.bfloat16) * 0.02
            return p, tx.init(p), jax.random.normal(
                jax.random.split(key)[0], shape, jnp.bfloat16) * 1e-3

        p, st, g = jax.block_until_ready(init(jax.random.PRNGKey(0)))

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def updK(p, st, g):
            def body(_, carry):
                p, st = carry
                u, st = tx.update(g, st, p)
                return optax.apply_updates(p, u), st
            return jax.lax.fori_loop(0, K, body, (p, st))

        p, st = updK(p, st, g)
        float(p[0, 0])  # warm
        t0 = time.perf_counter()
        p, st = updK(p, st, g)
        float(p[0, 0])
        dt = (time.perf_counter() - t0) / K
        print(f"  adamw update {n_params_m}M params (bf16 moments, "
              f"x{K} chained): {dt * 1000:.1f} ms/update -> "
              f"{n * 2 * 5 / dt / 1e9:.0f} GB/s eff")
        return dt / n

    per_param_small = measure(512)
    per_param_big = measure(1024)
    print(f"  per-param: {per_param_small * 1e12:.3f} vs "
          f"{per_param_big * 1e12:.3f} ps (linearity check)")
    return per_param_big


def run_full_step(depth, remat="nothing", n_calls=2, offload=False,
                  in_backward=False, moments_int8=False, mlp_chunk=None):
    """Directly-measured REAL train step (fwd+bwd+clip+adamw in ONE
    jitted program).  ``offload=True`` keeps the Adam moments in pinned
    host memory (parallel/offload.py — the zero3_offload equivalent),
    which lets the MEASUREMENT run at depths whose moments don't fit
    HBM: XLA streams them over PCIe and overlaps the transfers with the
    backward (VERDICT r3 item 2 — full-step MFU measured, not
    composed)."""
    from mantis_tpu.models.mllava import model as mllava_model
    from mantis_tpu.train import trainer as T

    cfg = make_cfg(depth)
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(0),
                                      dtype=jnp.bfloat16)
    if moments_int8:
        # unstacked decoder layers: each layer's grad is produced at a
        # distinct backward point and freed as its in-backward update
        # consumes it (a scan over stacked params would hold the FULL
        # grad tree in accumulators for the whole backward — +5.6 GB)
        from mantis_tpu.models import llama

        params = dict(params)
        params["language_model"] = llama.unstack_layers(
            params["language_model"])
    tcfg = T.TrainConfig(learning_rate=1e-5, lr_schedule="constant",
                         max_steps=100, compute_dtype="bfloat16",
                         use_remat=remat, loss_chunk_size=CHUNK,
                         optimizer_offload=offload,
                         # in-backward consumes grads per-leaf; no
                         # same-step global clip (trainer refuses it)
                         grad_clip=0.0 if in_backward else 1.0,
                         optimizer_in_backward=in_backward,
                         optimizer_moments_int8=moments_int8,
                         mlp_chunk=mlp_chunk)
    trainable, frozen = T.partition_params(
        params, lambda p: T.default_trainable_pred(p, freeze_vision=True))
    opt, _ = T.make_optimizer(tcfg)
    step_fn = T.make_train_step(mllava_model.forward, cfg, tcfg, opt,
                                frozen)
    state = T.create_train_state(trainable, opt,
                                 optimizer_offload=offload,
                                 moments_int8=moments_int8)
    batches = [make_batch(cfg, i) for i in range(n_calls + 1)]
    t0 = time.perf_counter()
    state, m = step_fn(state, batches[-1])
    print(f"  compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={float(m['loss']):.3f}")
    t0 = time.perf_counter()
    for b in batches[:n_calls]:
        state, m = step_fn(state, b)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n_calls
    fl = model_flops_per_step(cfg)
    print(f"full depth={depth} remat={remat} offload={offload}: "
          f"{dt * 1000:.1f} ms/step, MFU={fl / dt / PEAK_FLOPS:.4f}")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sections", nargs="*",
                    default=["fb8", "adam", "full4"])
    ap.add_argument("--remat", default="nothing")
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--mlp_chunk", type=int, default=None)
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--s", type=int, default=8192)
    args = ap.parse_args()
    global CHUNK, B, S
    CHUNK = args.chunk
    B = args.b
    S = args.s

    results = {}
    if "fb8" in args.sections:
        results["fb8"] = run_fb(8, args.remat)
    if "fb4" in args.sections:
        results["fb4"] = run_fb(4, args.remat)
    if "adam" in args.sections:
        results["adam_pp"] = run_adam_slabs()
    if "full4" in args.sections:
        results["full4"] = run_full_step(4, args.remat)
    if "fb2" in args.sections:
        results["fb2"] = run_fb(2, args.remat)
    if "full2" in args.sections:
        results["full2"] = run_full_step(2, args.remat)
    if "full8_offload" in args.sections:
        # the MEASURED honest config: one program doing fwd+bwd+adamw
        # with host-resident moments (VERDICT r3 item 2)
        results["full8_offload"] = run_full_step(8, args.remat,
                                                 offload=True)
    if "full16_offload" in args.sections:
        results["full16_offload"] = run_full_step(16, "dots",
                                                  offload=True)
    if "full8_inbackward" in args.sections:
        # optimizer-IN-BACKWARD + host moments: the measured
        # single-chip full-step configuration (no grad tree, moment
        # streaming paced across the backward window)
        results["full8_inbackward"] = run_full_step(
            8, args.remat, offload=True, in_backward=True)
    if "full16_inbackward" in args.sections:
        results["full16_inbackward"] = run_full_step(
            16, args.remat, offload=True, in_backward=True)
    if "full8_int8" in args.sections:
        # THE measured single-chip full-step configuration: in-backward
        # adamw8bit (root-domain blockwise-int8 moments on device,
        # 1 byte/param) over unstacked layers — fwd+bwd+update in ONE
        # program, no host transfers, no grad tree
        results["full8_int8"] = run_full_step(
            8, args.remat, in_backward=True, moments_int8=True,
            mlp_chunk=args.mlp_chunk)
    if "full4_int8" in args.sections:
        results["full4_int8"] = run_full_step(
            4, args.remat, in_backward=True, moments_int8=True,
            mlp_chunk=args.mlp_chunk)
    if "full2_int8" in args.sections:
        results["full2_int8"] = run_full_step(
            2, args.remat, in_backward=True, moments_int8=True,
            mlp_chunk=args.mlp_chunk)
    if "full16_int8" in args.sections:
        results["full16_int8"] = run_full_step(
            16, args.remat, in_backward=True, moments_int8=True,
            mlp_chunk=args.mlp_chunk)
    if "full8_int8_host" in args.sections:
        # adamw8bit x zero3_offload: packed int8 moments in PINNED HOST
        # memory, streamed per leaf through the fused update kernel as
        # grads arrive — HBM holds no optimizer state, so the full
        # fwd+bwd+update program fits depth 8 with room to spare
        results["full8_int8_host"] = run_full_step(
            8, args.remat, in_backward=True, moments_int8=True,
            offload=True)
    if "full16_int8_host" in args.sections:
        results["full16_int8_host"] = run_full_step(
            16, args.remat, in_backward=True, moments_int8=True,
            offload=True, mlp_chunk=args.mlp_chunk)

    if "fb8" in results and "adam_pp" in results:
        n_train = trainable_param_count(8)
        t_adam = results["adam_pp"] * n_train
        t_full = results["fb8"] + t_adam
        fl = model_flops_per_step(make_cfg(8))
        print(f"\nCOMPOSED depth-8 honest step: fb {results['fb8'] * 1e3:.1f}"
              f" + adam({n_train / 1e9:.2f}B) {t_adam * 1e3:.1f} ms "
              f"= {t_full * 1e3:.1f} ms -> MFU {fl / t_full / PEAK_FLOPS:.4f}")
        if "full4" in results and "fb4" in results:
            delta = results["full4"] - results["fb4"]
            pred = results["adam_pp"] * trainable_param_count(4)
            print(f"cross-check depth-4: measured full-fb delta "
                  f"{delta * 1e3:.1f} ms vs slab-predicted {pred * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
