"""Qwen2-VL — variable-resolution ViT (2-D vision rotary, patch merger)
+ Qwen2 LM with M-RoPE, plus the reference's sequence-classification /
regression extension.

Reference: mantis/models/qwen2_vl/modeling_qwen2_vl.py — a thin fork of
HF Qwen2-VL adding ``Qwen2VLForSequenceClassification`` (:62) with 3-D
M-RoPE ``get_rope_index`` (:105-251) and special-label-token pooling
(:377-392).  Here the whole stack is TPU-native:

- Vision patches arrive pre-flattened in spatial-merge-group order
  (host-side processor), with per-image segment ids replacing the
  reference's cu_seqlens windows, and (h, w) rotary ids.
- The LM is the shared LLaMA core with attention_bias + mrope_section.
- ``get_rope_index`` is re-derived host-side in numpy and verified
  against HF in tests.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mantis_tpu.models import llama
from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.ops.remat import remat
from mantis_tpu.models.llama import KVCache
from mantis_tpu.models.mllava.model import cross_entropy_loss
from mantis_tpu.models.vit import layer_norm, quick_gelu
from mantis_tpu.ops.flash_attention import flash_attention, mha_reference


@dataclasses.dataclass(frozen=True)
class Qwen2VLVisionConfig:
    depth: int = 32
    embed_dim: int = 1280
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    mlp_ratio: float = 4.0
    hidden_size: int = 3584  # LM hidden (merger output)

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def merger_in(self) -> int:
        return self.embed_dim * self.spatial_merge_size ** 2


@dataclasses.dataclass(frozen=True)
class Qwen2VLConfig:
    vision_config: Qwen2VLVisionConfig = dataclasses.field(
        default_factory=Qwen2VLVisionConfig)
    text_config: LlamaConfig = dataclasses.field(
        default_factory=lambda: LlamaConfig(
            vocab_size=152064, hidden_size=3584, intermediate_size=18944,
            num_hidden_layers=28, num_attention_heads=28,
            num_key_value_heads=4, rope_theta=1e6, rms_norm_eps=1e-6,
            attention_bias=True, mrope_section=(16, 24, 24)))
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    ignore_index: int = -100
    num_labels: int = 2
    score_type: str = "last_token"   # or 'special_token'

    @classmethod
    def from_hf_config(cls, cfg) -> "Qwen2VLConfig":
        get = (cfg.get if isinstance(cfg, dict)
               else lambda k, d=None: getattr(cfg, k, d))
        vc = get("vision_config")
        vget = (vc.get if isinstance(vc, dict)
                else lambda k, d=None: getattr(vc, k, d))
        # HF stores text fields either nested or at top level
        tc = get("text_config") or cfg
        text = LlamaConfig.from_hf_config(tc)
        # Qwen2 ALWAYS carries q/k/v biases, but HF Qwen2VLTextConfig
        # has no attention_bias key — defaulting it False would load
        # real checkpoints with their (large, nonzero) qkv biases
        # silently DROPPED (train/archs.py hardcodes the same fact)
        text = dataclasses.replace(text, attention_bias=True)
        if text.mrope_section is None:
            rs = (tc.get("rope_scaling") if isinstance(tc, dict)
                  else getattr(tc, "rope_scaling", None))
            if rs and "mrope_section" in rs:
                text = dataclasses.replace(
                    text, mrope_section=tuple(rs["mrope_section"]))
        return cls(
            vision_config=Qwen2VLVisionConfig(
                depth=vget("depth", 32),
                embed_dim=vget("embed_dim", 1280),
                num_heads=vget("num_heads", 16),
                in_channels=vget("in_channels", 3),
                patch_size=vget("patch_size", 14),
                temporal_patch_size=vget("temporal_patch_size", 2),
                spatial_merge_size=vget("spatial_merge_size", 2),
                mlp_ratio=vget("mlp_ratio", 4.0),
                hidden_size=vget("hidden_size", 3584),
            ),
            text_config=text,
            image_token_id=get("image_token_id", 151655),
            video_token_id=get("video_token_id", 151656),
            vision_start_token_id=get("vision_start_token_id", 151652),
        )


# ---------------------------------------------------------------------------
# Host-side geometry
# ---------------------------------------------------------------------------

def vision_rot_pos_ids(grid_thw: Sequence[Tuple[int, int, int]],
                       merge: int) -> np.ndarray:
    """(h, w) rotary ids per patch in spatial-merge-group order
    (mirrors Qwen2VisionTransformer.rot_pos_emb)."""
    out = []
    for t, h, w in grid_thw:
        hp = np.arange(h)[:, None].repeat(w, axis=1)
        wp = np.arange(w)[None, :].repeat(h, axis=0)

        def reorder(x):
            x = x.reshape(h // merge, merge, w // merge, merge)
            return x.transpose(0, 2, 1, 3).reshape(-1)

        ids = np.stack([reorder(hp), reorder(wp)], axis=-1)
        out.append(np.tile(ids, (t, 1)))
    return np.concatenate(out, axis=0)  # [Np, 2]


def vision_segment_ids(grid_thw) -> np.ndarray:
    segs = []
    for i, (t, h, w) in enumerate(grid_thw, start=1):
        segs.append(np.full(t * h * w, i, np.int32))
    return np.concatenate(segs)


def get_rope_index(
    input_ids: np.ndarray,
    image_grid_thw: Optional[np.ndarray],
    attention_mask: Optional[np.ndarray],
    cfg: Qwen2VLConfig,
    video_grid_thw: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """3-D (t/h/w) position ids per token (reference :105-251; HF
    semantics re-derived): text advances all three axes together; each
    vision span pins t and sweeps the (h, w) grid (merged resolution);
    the axes re-synchronize at max+1 after each span.

    Returns (position_ids [3, B, S], rope_deltas [B, 1]).
    """
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = np.ones((b, s), np.int64)
    pos = np.ones((3, b, s), np.int64)
    deltas = np.zeros((b, 1), np.int64)
    merge = cfg.vision_config.spatial_merge_size
    img_idx = vid_idx = 0
    grids_i = list(image_grid_thw) if image_grid_thw is not None else []
    grids_v = list(video_grid_thw) if video_grid_thw is not None else []
    for row in range(b):
        ids = input_ids[row][attention_mask[row] == 1]
        n = len(ids)
        t_pos = np.zeros(n, np.int64)
        h_pos = np.zeros(n, np.int64)
        w_pos = np.zeros(n, np.int64)
        st = 0   # current index into ids
        nxt = 0  # next position value
        i = 0
        while i < n:
            tok = ids[i]
            if tok == cfg.image_token_id or tok == cfg.video_token_id:
                if tok == cfg.image_token_id:
                    t, h, w = grids_i[img_idx]
                    img_idx += 1
                else:
                    t, h, w = grids_v[vid_idx]
                    vid_idx += 1
                lh, lw = h // merge, w // merge
                span = t * lh * lw
                if i + span > n:
                    # a truncated placeholder run would either crash
                    # the broadcast below or silently misalign every
                    # later row's grid — fail with guidance instead
                    raise ValueError(
                        f"image/video placeholder run truncated at "
                        f"position {i} (needs {span} tokens, {n - i} "
                        f"left); raise the seq bucket / max_seq_len")
                tg = np.repeat(np.arange(t), lh * lw)
                hg = np.tile(np.repeat(np.arange(lh), lw), t)
                wg = np.tile(np.tile(np.arange(lw), lh), t)
                t_pos[i:i + span] = nxt + tg
                h_pos[i:i + span] = nxt + hg
                w_pos[i:i + span] = nxt + wg
                nxt = nxt + int(max(t, lh, lw))
                i += span
            else:
                t_pos[i] = h_pos[i] = w_pos[i] = nxt
                nxt += 1
                i += 1
        sel = attention_mask[row] == 1
        pos[0, row, sel] = t_pos
        pos[1, row, sel] = h_pos
        pos[2, row, sel] = w_pos
        deltas[row, 0] = nxt - n
    return pos, deltas


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------

def init_vision_params(cfg: Qwen2VLVisionConfig, key, dtype=jnp.float32):
    e = cfg.embed_dim
    mlp = int(e * cfg.mlp_ratio)
    L = cfg.depth
    ks = jax.random.split(key, 8)
    patch_in = (cfg.in_channels * cfg.temporal_patch_size
                * cfg.patch_size ** 2)

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(
            dtype)

    mi = cfg.merger_in
    return {
        "patch_embed": norm(ks[0], (patch_in, e)),
        "blocks": {
            "ln1_scale": jnp.ones((L, e), dtype),
            "ln1_bias": jnp.zeros((L, e), dtype),
            "qkv": norm(ks[1], (L, e, 3 * e)),
            "qkv_b": jnp.zeros((L, 3 * e), dtype),
            "proj": norm(ks[2], (L, e, e)),
            "proj_b": jnp.zeros((L, e), dtype),
            "ln2_scale": jnp.ones((L, e), dtype),
            "ln2_bias": jnp.zeros((L, e), dtype),
            "fc1": norm(ks[3], (L, e, mlp)),
            "fc1_b": jnp.zeros((L, mlp), dtype),
            "fc2": norm(ks[4], (L, mlp, e)),
            "fc2_b": jnp.zeros((L, e), dtype),
        },
        "merger": {
            "ln_q_scale": jnp.ones((e,), dtype),
            "ln_q_bias": jnp.zeros((e,), dtype),
            "mlp0": norm(ks[5], (mi, mi)),
            "mlp0_b": jnp.zeros((mi,), dtype),
            "mlp2": norm(ks[6], (mi, cfg.hidden_size)),
            "mlp2_b": jnp.zeros((cfg.hidden_size,), dtype),
        },
    }


def _apply_vision_rope(x, cos, sin):
    """x [1, Np, H, Dh]; cos/sin [Np, Dh] (rotate_half convention)."""
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos[None, :, None, :] + rot * sin[None, :, None, :]
            ).astype(x.dtype)


def vision_forward(params, cfg: Qwen2VLVisionConfig, patches,
                   rot_pos_ids, segment_ids, attn_impl=None,
                   use_remat: bool = False):
    """patches [Np, C*Tp*P*P] (merge-group order); rot_pos_ids [Np, 2];
    segment_ids [Np] (per image).  Returns merged tokens
    [Np / merge^2, hidden_size]."""
    e, H, dh = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    x = patches.astype(params["patch_embed"].dtype) @ params["patch_embed"]
    npatch = x.shape[0]

    # 2-D rotary: head_dim/4 freqs per axis -> [Np, Dh/2] -> doubled
    inv_freq = 1.0 / (10000.0 ** (
        jnp.arange(0, dh // 2, 2, dtype=jnp.float32) / (dh // 2)))
    freqs = rot_pos_ids.astype(jnp.float32)[..., None] * inv_freq
    freqs = freqs.reshape(npatch, -1)           # [Np, Dh/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    seg = segment_ids[None]  # [1, Np]

    def block(h, lp):
        residual = h
        xx = layer_norm(h, lp["ln1_scale"], lp["ln1_bias"], 1e-6)
        qkv = (xx @ lp["qkv"] + lp["qkv_b"]).reshape(1, npatch, 3, H, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _apply_vision_rope(q, cos, sin)
        k = _apply_vision_rope(k, cos, sin)
        if attn_impl == "xla":
            attn = mha_reference(q, k, v, causal=False, segment_ids=seg)
        else:
            attn = flash_attention(q, k, v, causal=False,
                                   segment_ids=seg,
                                   implementation=attn_impl)
        h = residual + (attn.reshape(1, npatch, e) @ lp["proj"]
                        + lp["proj_b"])
        residual = h
        xx = layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], 1e-6)
        h = residual + (quick_gelu(xx @ lp["fc1"] + lp["fc1_b"])
                        @ lp["fc2"] + lp["fc2_b"])
        return h, None

    blk = remat(block, use_remat)
    x, _ = jax.lax.scan(blk, x[None], params["blocks"])
    x = x[0]

    m = params["merger"]
    x = layer_norm(x, m["ln_q_scale"], m["ln_q_bias"], 1e-6)
    x = x.reshape(-1, cfg.merger_in)
    x = jax.nn.gelu(x @ m["mlp0"] + m["mlp0_b"], approximate=False)
    return x @ m["mlp2"] + m["mlp2_b"]


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def init_params(cfg: Qwen2VLConfig, key, dtype=jnp.float32):
    kv, kl = jax.random.split(key)
    return {
        "visual": init_vision_params(cfg.vision_config, kv, dtype),
        "language_model": llama.init_params(cfg.text_config, kl, dtype),
    }


def init_classification_params(cfg: Qwen2VLConfig, key,
                               dtype=jnp.float32):
    params = init_params(cfg, key, dtype)
    params["score"] = (jax.random.normal(
        key, (cfg.text_config.hidden_size, cfg.num_labels),
        jnp.float32) * 0.02).astype(dtype)
    return params


def _merge_visual(embeds, input_ids, visual_tokens, token_id):
    b, s, d = embeds.shape
    flat = visual_tokens.astype(embeds.dtype)
    is_v = (input_ids == token_id).reshape(-1)
    idx = jnp.clip(jnp.cumsum(is_v) - 1, 0, flat.shape[0] - 1)
    gathered = flat[idx].reshape(b, s, d)
    return jnp.where(is_v.reshape(b, s)[..., None], gathered, embeds)


def forward(
    params,
    cfg: Qwen2VLConfig,
    *,
    input_ids: jax.Array,
    pixel_values: Optional[jax.Array] = None,   # flattened patches
    rot_pos_ids: Optional[jax.Array] = None,
    vision_segment_ids_arr: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,      # [3, B, S] M-RoPE
    segment_ids: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    kv_cache: Optional[KVCache] = None,
    attn_impl: Optional[str] = None,
    use_remat: bool = False,
):
    embeds = params["language_model"]["embed_tokens"][input_ids]
    if pixel_values is not None and input_ids.shape[1] > 1:
        vis = vision_forward(params["visual"], cfg.vision_config,
                             pixel_values, rot_pos_ids,
                             vision_segment_ids_arr, attn_impl=attn_impl,
                             use_remat=use_remat)
        embeds = _merge_visual(embeds, input_ids, vis, cfg.image_token_id)
    logits, new_cache = llama.forward(
        params["language_model"], cfg.text_config, inputs_embeds=embeds,
        positions=positions, segment_ids=segment_ids, kv_cache=kv_cache,
        attn_impl=attn_impl, use_remat=use_remat)
    loss = None
    if labels is not None:
        mask = None if segment_ids is None else (segment_ids != 0)
        loss = cross_entropy_loss(logits, labels, mask, cfg.ignore_index)
    return logits, loss, new_cache


def forward_classification(
    params, cfg: Qwen2VLConfig, *, input_ids, pixel_values=None,
    rot_pos_ids=None, vision_segment_ids_arr=None, positions=None,
    segment_ids=None, label_token_positions=None, attn_impl=None,
    use_remat: bool = False,
):
    """Classification / regression head.

    score_type='last_token': pool at the last non-pad token.
    score_type='special_token': ``label_token_positions`` [B, num_labels]
    gives each label token's index; logit i = score_i(h[pos_i])
    (reference :377-392; per-label heads folded into one [D, num_labels]
    matrix with per-column gather).
    """
    embeds = params["language_model"]["embed_tokens"][input_ids]
    if pixel_values is not None:
        vis = vision_forward(params["visual"], cfg.vision_config,
                             pixel_values, rot_pos_ids,
                             vision_segment_ids_arr, attn_impl=attn_impl)
        embeds = _merge_visual(embeds, input_ids, vis, cfg.image_token_id)
    b, s, _ = embeds.shape
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)
    hidden, _ = llama.forward(
        params["language_model"], cfg.text_config, inputs_embeds=embeds,
        positions=positions, segment_ids=segment_ids,
        attn_impl=attn_impl, use_remat=use_remat, return_hidden=True)
    if cfg.score_type == "special_token":
        assert label_token_positions is not None
        # h at each label token: [B, num_labels, D]
        lh = jnp.take_along_axis(
            hidden, label_token_positions[..., None], axis=1)
        # per-label column of the score matrix
        return jnp.einsum("bld,dl->bl", lh, params["score"])
    last = jnp.sum(segment_ids != 0, axis=1) - 1
    pooled = jnp.take_along_axis(hidden, last[:, None, None], axis=1)[:, 0]
    return pooled @ params["score"]
