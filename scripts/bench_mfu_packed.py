"""MFU on REALLY PACKED data (VERDICT r3 item 3 follow-through).

The honest-MFU bench (bench_mfu_honest.py / bench.py) times the train
step on hand-built perfectly-packed rows.  This script instead runs the
repo's OWN data path end to end on a realistic variable-length mixture:

  synthetic SFT json (lognormal-ish length mix, 1-4 images/conv)
    -> ChatDataset (probe-calibrated estimate_length)
    -> PackingDataset (first-fit-decreasing plan, 8192-token packs)
    -> Collator (pad_to_max 8192, image bucket)
    -> flagship-width mllava train step (depth 8)

and reports the planner's fill rate plus two MFU numbers:
  - mfu_hw:   FLOPs for every processed position / wall time
              (what the chip sustains on the padded shapes)
  - mfu_data: FLOPs for NON-PAD positions + REAL images only / wall
              time (what a user's samples/sec actually buys — this is
              the number packing quality moves)

Text lengths use the debug tokenizer (vocab ~hundreds); the MODEL runs
the full flagship widths incl. the 128,258-entry vocab through chunked
CE, so per-token cost matches the honest bench exactly.

Usage: python scripts/bench_mfu_packed.py [--depth 8] [--n 160]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

PEAK_FLOPS = 197e12
S = 8192
IMG_BUCKET = 8


def make_dataset_json(n_conv: int, seed: int, img_dir: str) -> str:
    """Synthetic SFT mixture with a realistic length spread: the debug
    tokenizer maps one whitespace word -> one token, so word counts
    below are token counts.  Image tokens (729 each) come on top."""
    rng = np.random.RandomState(seed)
    words = ("the quick brown fox jumps over lazy dog while red square "
             "green circle blue triangle appear in picture frame one two "
             "three four compare describe difference detail").split()
    data = []
    for i in range(n_conv):
        # lognormal text budget, clamped: mix of short QA and long chats
        text_tok = int(np.clip(rng.lognormal(6.0, 0.9), 40, 5200))
        n_img = int(rng.choice([1, 1, 2, 2, 3, 4]))
        n_turns = int(rng.randint(1, 4))
        per_turn = max(text_tok // (2 * n_turns), 4)
        convs = []
        for t in range(n_turns):
            human = " ".join(rng.choice(words, per_turn))
            if t == 0:
                human = " ".join(["<image>"] * n_img) + " " + human
            convs.append({"from": "human", "value": human})
            convs.append({"from": "gpt",
                          "value": " ".join(rng.choice(words, per_turn))})
        data.append({"id": f"pk-{i}",
                     "images": [f"{img_dir}/img{i % 2}.png"] * n_img,
                     "conversations": convs})
    path = os.path.join(tempfile.mkdtemp(prefix="mfu_packed_"),
                        "train.json")
    with open(path, "w") as f:
        json.dump(data, f)
    return path


# Structural profiles of the 17 Mantis-Instruct subsets, used by
# --mixture mantis_instruct.  This image has zero egress (the real
# 721K mixture cannot be downloaded), so lengths are MODELED, not
# sampled — but per subset, from its documented structure: images and
# turns per conversation from each converter's output schema
# (data_prep/prepare_*.py; e.g. nlvr2 is always 2 images/1 turn,
# imagecode 10 images/1 short query, coinstruct long multi-turn), and
# mixture weights from the approximate public dataset-card sizes (in
# thousands; TIGER-Lab/Mantis-Instruct, 721K total).  The bench reads
# the subset LIST from configs/mantis_instruct.yaml and refuses to run
# if a listed subset has no profile, so config and model cannot drift.
#   name: (weight_k, (img_lo, img_hi), (turns_lo, turns_hi),
#          (human_words_lo, hi), (gpt_words_lo, hi))
MIXTURE_PROFILES = {
    "nlvr2":                (86, (2, 2), (1, 1), (18, 35), (1, 12)),
    "dreamsim":             (16, (3, 3), (1, 1), (15, 25), (3, 8)),
    "contrastive_caption":  (36, (2, 4), (1, 2), (10, 20), (30, 80)),
    "birds-to-words":       (3, (2, 2), (1, 1), (10, 18), (25, 60)),
    "visual_story_telling": (7, (5, 5), (2, 5), (5, 15), (10, 25)),
    "spot-the-diff":        (11, (2, 2), (1, 1), (8, 15), (10, 40)),
    "lrv_multi":            (8, (2, 3), (2, 6), (8, 20), (10, 30)),
    "nextqa":               (4, (8, 8), (1, 2), (10, 20), (1, 8)),
    "star":                 (3, (8, 8), (1, 2), (10, 20), (1, 8)),
    "llava_665k_multi":     (313, (1, 3), (2, 6), (8, 25), (15, 80)),
    "coinstruct":           (151, (1, 4), (2, 8), (15, 40), (20, 90)),
    "dvqa":                 (20, (1, 1), (1, 3), (8, 15), (1, 5)),
    "chartqa":              (28, (1, 1), (1, 2), (10, 20), (1, 8)),
    "docvqa":               (39, (1, 1), (1, 2), (10, 18), (1, 6)),
    "multi_vqa":            (5, (2, 4), (2, 5), (10, 25), (10, 40)),
    "iconqa":               (34, (1, 2), (1, 1), (10, 20), (1, 5)),
    "imagecode":            (17, (10, 10), (1, 1), (12, 30), (1, 3)),
}


def make_mixture_json(n_conv: int, seed: int, img_dir: str,
                      config_path: str = "configs/mantis_instruct.yaml"
                      ) -> str:
    """Synthetic mixture shaped like the FLAGSHIP config's 17 subsets
    (VERDICT r4 item 6: the packing bench must consume the actual
    config's length characteristics, not one global lognormal)."""
    import yaml

    with open(config_path) as f:
        entries = yaml.safe_load(f)["data"]
    names = [e["name"] for e in entries]
    missing = [n for n in names if n not in MIXTURE_PROFILES]
    assert not missing, f"no mixture profile for subsets: {missing}"

    rng = np.random.RandomState(seed)
    words = ("the quick brown fox jumps over lazy dog while red square "
             "green circle blue triangle appear in picture frame one two "
             "three four compare describe difference detail").split()
    # weights = card size capped by the config's own max_size knob
    # (the trained mixture samples at most max_size per subset)
    weights = np.array(
        [min(MIXTURE_PROFILES[n][0] * 1000.0,
             next((e.get("max_size", np.inf) for e in entries
                   if e["name"] == n)))
         for n in names], float)
    weights /= weights.sum()
    data = []
    for i in range(n_conv):
        name = names[int(rng.choice(len(names), p=weights))]
        _, (i_lo, i_hi), (t_lo, t_hi), (h_lo, h_hi), (g_lo, g_hi) = \
            MIXTURE_PROFILES[name]
        cap = next((e.get("max_num_images") for e in entries
                    if e["name"] == name), None)
        n_img = min(int(rng.randint(i_lo, i_hi + 1)), cap or 99)
        n_turns = int(rng.randint(t_lo, t_hi + 1))
        convs = []
        for t in range(n_turns):
            human = " ".join(
                rng.choice(words, int(rng.randint(h_lo, h_hi + 1))))
            if t == 0:
                human = " ".join(["<image>"] * n_img) + " " + human
            convs.append({"from": "human", "value": human})
            convs.append({"from": "gpt", "value": " ".join(
                rng.choice(words, int(rng.randint(g_lo, g_hi + 1))))})
        data.append({"id": f"mi-{name}-{i}",
                     "images": [f"{img_dir}/img{i % 2}.png"] * n_img,
                     "conversations": convs})
    path = os.path.join(tempfile.mkdtemp(prefix="mfu_mixture_"),
                        "train.json")
    with open(path, "w") as f:
        json.dump(data, f)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--n", type=int, default=160)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--remat", default="nothing")
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--mixture", default="mantis_instruct",
                    choices=("mantis_instruct", "lognormal"),
                    help="length distribution: the flagship config's "
                         "17-subset structural mixture (default) or "
                         "the round-3 global lognormal")
    args = ap.parse_args()

    from mantis_tpu.models.configs import (
        LlamaConfig, LlavaConfig, VisionConfig)
    from mantis_tpu.models.conversation import conv_templates
    from mantis_tpu.models.mllava import model as mllava_model
    from mantis_tpu.models.mllava.processor import (
        ImageProcessorConfig, MantisImageProcessor, MLlavaProcessor)
    from mantis_tpu.train import trainer as T
    from mantis_tpu.train.data import (
        ChatDataset, Collator, PackingDataset)
    from mantis_tpu.utils.debug_tokenizer import (
        build_tokenizer_from_json_data)

    img_dir = os.path.abspath("examples/data/chat/images")
    path = (make_mixture_json(args.n, 0, img_dir)
            if args.mixture == "mantis_instruct"
            else make_dataset_json(args.n, 0, img_dir))
    tok = build_tokenizer_from_json_data([path])

    cfg = LlavaConfig(
        vision_config=VisionConfig(
            tower_type="siglip", hidden_size=1152, intermediate_size=4304,
            num_hidden_layers=27, num_attention_heads=16, image_size=384,
            patch_size=14, layer_norm_eps=1e-6),
        text_config=LlamaConfig(
            vocab_size=128258, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=args.depth, num_attention_heads=32,
            num_key_value_heads=8, rope_theta=500000.0),
        image_token_index=tok.convert_tokens_to_ids("<image>"),
    )
    P = cfg.num_image_tokens
    proc = MLlavaProcessor(
        tok, MantisImageProcessor(
            ImageProcessorConfig.for_tower("siglip", 384)), P)
    conv = conv_templates["llama_3"]
    ds = ChatDataset(path, proc, conv, max_seq_len=S)
    # <=8 images per pack on the lognormal mix (capping lower
    # fragments the plan: a 4-cap measured fill 0.86 vs 0.95).  The
    # mantis_instruct mixture is image-token-dominated (~1.9
    # images/conv x 729 tokens vs ~150 text tokens), so the image cap
    # binds earlier: measured planned fill 0.819 at cap 8 -> 0.936 at
    # cap 10, saturating above.  Pad images cost only forward FLOPs
    # (~2% of the step at these widths).
    img_cap = 10 if args.mixture == "mantis_instruct" else IMG_BUCKET
    packed = PackingDataset(ds, max_self_attn_len=S,
                            max_images_per_pack=img_cap)
    fill_planned = packed.planned_fill_rate()
    # vision bucket: smallest even count covering the sampled batches
    # (a fixed 16-image bucket OOMs next to the depth-8 train state;
    # production uses the Collator's power-of-two bucket ladder)
    pairs = [(packed[i], packed[i + 1])
             for i in range(0, min(len(packed),
                                   2 * (args.steps + 1)), 2)]
    vb = max(sum(int(e["pixel_values"].shape[0]) for e in exs)
             for exs in pairs)
    vb += vb % 2
    coll = Collator(
        pad_token_id=tok.pad_token_id or 0,
        image_token_id=cfg.image_token_index,
        num_image_tokens=P, seq_buckets=(S,),
        image_buckets=(vb,), image_size=384,
        pad_to_max=True,
        # packed rows have no headroom for placeholder blocks; mllava
        # gathers features by image-token order, so pad images ride
        # only in pixel_values (see Collator.pad_image_tokens)
        pad_image_tokens=False)

    # two packs per batch: the honest bench's b2 s8192 shapes
    batches, used_tok, used_img = [], [], []
    for exs in pairs:
        b = coll(list(exs))
        used_tok.append(int((b["segment_ids"] != 0).sum()))
        used_img.append(sum(int(e["pixel_values"].shape[0])
                            for e in exs))
        batches.append({
            "input_ids": jnp.asarray(b["input_ids"]),
            "labels": jnp.asarray(b["labels"]),
            "segment_ids": jnp.asarray(b["segment_ids"]),
            "positions": jnp.asarray(b["positions"]),
            "pixel_values": jnp.asarray(b["pixel_values"],
                                        jnp.bfloat16),
        })
    assert len(batches) >= 2, "need >=4 packs; raise --n"
    fill_measured = float(np.mean([u / (2 * S) for u in used_tok]))
    print(f"packs={len(packed)} fill: planned={fill_planned:.3f} "
          f"measured={fill_measured:.3f}")

    # the MEASURED full-step configuration (bench.py train_step_mfu):
    # optimizer-in-backward adamw8bit over unstacked layers — the only
    # way fwd+bwd+update fits depth 8 on one 16 GB chip
    from mantis_tpu.models import llama

    params = mllava_model.init_params(cfg, jax.random.PRNGKey(0),
                                      dtype=jnp.bfloat16)
    params = dict(params, language_model=llama.unstack_layers(
        params["language_model"]))
    tcfg = T.TrainConfig(learning_rate=1e-5, lr_schedule="constant",
                         max_steps=100, compute_dtype="bfloat16",
                         use_remat=args.remat,
                         loss_chunk_size=args.chunk, grad_clip=0.0,
                         optimizer_in_backward=True,
                         optimizer_moments_int8=True, mlp_chunk=4)
    trainable, frozen = T.partition_params(
        params,
        lambda p: T.default_trainable_pred(p, freeze_vision=True))
    opt, _ = T.make_optimizer(tcfg)
    step_fn = T.make_train_step(mllava_model.forward, cfg, tcfg, opt,
                                frozen)
    state = T.create_train_state(trainable, opt, moments_int8=True)

    state, m = step_fn(state, batches[-1])     # compile + warm
    float(m["loss"])
    t0 = time.perf_counter()
    for b in batches[:args.steps]:
        state, m = step_fn(state, b)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / args.steps

    # FLOPs (same accounting as bench_mfu_honest.model_flops_per_step,
    # b=1): hardware counts all S positions + IMG_BUCKET images;
    # data-useful counts non-pad positions + real images
    t, v = cfg.text_config, cfg.vision_config
    d, li, V = t.hidden_size, t.intermediate_size, t.vocab_size
    dh = d // t.num_attention_heads
    # canonical per-layer accounting (pinned in tests/test_trainer.py::
    # test_mfu_flops_formula; an earlier form halved the attn projs)
    from mantis_tpu.utils.profiling import llama_layer_matmul_params
    lm_layer = llama_layer_matmul_params(
        d, t.num_attention_heads, t.num_key_value_heads, li)
    per_tok = 6 * (args.depth * lm_layer + d * V)
    vit_layer = 4 * v.hidden_size ** 2 + 2 * v.hidden_size * \
        v.intermediate_size
    per_img = 2 * P * ((v.num_hidden_layers - 1) * vit_layer
                       + 3 * v.patch_size ** 2 * v.hidden_size) \
        + 6 * P * (v.hidden_size * d + d * d)
    mean_tok = float(np.mean(used_tok[:args.steps]))
    mean_img = float(np.mean(used_img[:args.steps]))
    fl_hw = per_tok * 2 * S + per_img * vb
    fl_data = per_tok * mean_tok + per_img * mean_img
    print(f"step {dt * 1e3:.1f} ms  mfu_hw={fl_hw / dt / PEAK_FLOPS:.4f}  "
          f"mfu_data={fl_data / dt / PEAK_FLOPS:.4f}  "
          f"(tok {mean_tok:.0f}/{2 * S}, img {mean_img:.1f}/"
          f"{vb})")
    print(json.dumps({
        "fill_planned": round(fill_planned, 4),
        "fill_measured": round(fill_measured, 4),
        "step_ms": round(dt * 1e3, 1),
        "mfu_hw": round(fl_hw / dt / PEAK_FLOPS, 4),
        "mfu_data": round(fl_data / dt / PEAK_FLOPS, 4),
    }))


if __name__ == "__main__":
    main()
