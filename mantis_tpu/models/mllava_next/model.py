"""MLlavaNext — LLaVA-NeXT (anyres) variant of MLlava.

Behavioral port of the reference
(reference: mantis/models/mllava_next/modeling_llava_next.py:317-650).
Note the reference DISABLES its spatial-unpad assembly at runtime
(modeling_llava_next.py:566 ``if image_feature.shape[0] > 1 and False``):
the shipped behavior is "base tile features + one image_newline embedding
per image".  That is the default here; the full anyres spatial-unpad
assembly is available via ``enable_anyres=True`` with host-side
precomputed gather indices (static shapes).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mantis_tpu.models import llama
from mantis_tpu.models.configs import LlavaConfig
from mantis_tpu.models.llama import KVCache
from mantis_tpu.models.mllava import model as mllava_model

DEFAULT_PINPOINTS = ((336, 672), (672, 336), (672, 672), (1008, 336),
                     (336, 1008))


@dataclasses.dataclass(frozen=True)
class LlavaNextConfig(LlavaConfig):
    image_grid_pinpoints: Tuple[Tuple[int, int], ...] = DEFAULT_PINPOINTS

    @property
    def tokens_per_image(self) -> int:
        """Base-tile patches + the trailing image_newline embedding
        (observed reference behavior, modeling_llava_next.py:592)."""
        return self.num_image_tokens + 1

    @classmethod
    def from_hf_config(cls, cfg):
        get = (cfg.get if isinstance(cfg, dict)
               else lambda k, d=None: getattr(cfg, k, d))
        base = LlavaConfig.from_hf_config(cfg)
        pin = get("image_grid_pinpoints") or DEFAULT_PINPOINTS
        return cls(**{**dataclasses.asdict(base),
                      "vision_config": base.vision_config,
                      "text_config": base.text_config,
                      "image_grid_pinpoints": tuple(
                          tuple(p) for p in pin)})


# ---------------------------------------------------------------------------
# anyres geometry (reference: modeling_llava_next.py:26-106)
# ---------------------------------------------------------------------------

def select_best_resolution(original_size: Tuple[int, int],
                           possible_resolutions) -> Tuple[int, int]:
    """(height, width) in, best (height, width) out — maximize effective
    resolution, break ties by minimal waste."""
    oh, ow = original_size
    best_fit = None
    max_eff = 0
    min_waste = float("inf")
    for h, w in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = (w * h) - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff = eff
            min_waste = waste
            best_fit = (h, w)
    return best_fit


def get_anyres_image_grid_shape(image_size, grid_pinpoints, patch_size):
    h, w = select_best_resolution(image_size, grid_pinpoints)
    return h // patch_size, w // patch_size


def unpad_shape(num_ph: int, num_pw: int, tokens_per_side: int,
                original_size: Tuple[int, int]) -> Tuple[int, int]:
    """Token-grid shape after unpadding (reference unpad_image, :86-106)."""
    oh, ow = original_size
    cur_h = num_ph * tokens_per_side
    cur_w = num_pw * tokens_per_side
    ratio_orig = ow / oh
    ratio_cur = cur_w / cur_h
    if ratio_orig > ratio_cur:
        scale = cur_w / ow
        new_h = int(oh * scale)
        pad = (cur_h - new_h) // 2
        return cur_h - 2 * pad, cur_w
    scale = cur_h / oh
    new_w = int(ow * scale)
    pad = (cur_w - new_w) // 2
    return cur_h, cur_w - 2 * pad


def anyres_assembly_indices(
    image_size: Tuple[int, int], grid_pinpoints, vision_image_size: int,
    patch_size: int, tile_offset: int,
) -> List[int]:
    """Flat gather indices into per-tile features for the FULL anyres
    layout: [base tile tokens..., row-major unpadded grid tokens with -1
    (newline) at each row end].  tile_offset indexes the first tile of
    this image in the flattened tile-feature tensor."""
    t = vision_image_size // patch_size  # tokens per tile side
    p2 = t * t
    num_ph, num_pw = get_anyres_image_grid_shape(
        image_size, grid_pinpoints, vision_image_size)
    out = [tile_offset * p2 + i for i in range(p2)]  # base tile
    uh, uw = unpad_shape(num_ph, num_pw, t, image_size)
    grid_h, grid_w = num_ph * t, num_pw * t
    top = (grid_h - uh) // 2
    left = (grid_w - uw) // 2
    for r in range(top, top + uh):
        for c in range(left, left + uw):
            ph, pr = divmod(r, t)
            pw, pc = divmod(c, t)
            tile = 1 + ph * num_pw + pw
            out.append((tile_offset + tile) * p2 + pr * t + pc)
        out.append(-1)  # newline
    return out


# ---------------------------------------------------------------------------
# Params / forward
# ---------------------------------------------------------------------------

def init_params(cfg: LlavaNextConfig, key: jax.Array, dtype=jnp.float32):
    kb, kn = jax.random.split(key)
    params = mllava_model.init_params(cfg, kb, dtype)
    params["image_newline"] = (
        jax.random.normal(kn, (cfg.text_config.hidden_size,), jnp.float32)
        * 0.02).astype(dtype)
    return params


def assemble_image_features(
    params, cfg: LlavaNextConfig, tile_features: jax.Array,
    first_tile_idx: jax.Array,
    assembly_indices: Optional[jax.Array] = None,
) -> jax.Array:
    """tile_features: [T, P, D] projected per-tile features.

    Default (reference-observed): per image -> [feats(first tile), newline]
    giving [num_images, P+1, D].  With assembly_indices (full anyres):
    flat [total_tokens, D] gathered with -1 -> newline.
    """
    newline = params["image_newline"].astype(tile_features.dtype)
    if assembly_indices is None:
        base = tile_features[first_tile_idx]        # [N, P, D]
        n = base.shape[0]
        nl = jnp.broadcast_to(newline[None, None, :],
                              (n, 1, base.shape[-1]))
        return jnp.concatenate([base, nl], axis=1)  # [N, P+1, D]
    flat = tile_features.reshape(-1, tile_features.shape[-1])
    idx = jnp.clip(assembly_indices, 0, flat.shape[0] - 1)
    gathered = flat[idx]
    return jnp.where((assembly_indices == -1)[:, None], newline[None, :],
                     gathered)


def forward(
    params,
    cfg: LlavaNextConfig,
    *,
    input_ids: jax.Array,
    pixel_values: Optional[jax.Array] = None,
    first_tile_idx: Optional[jax.Array] = None,
    assembly_indices: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    kv_cache: Optional[KVCache] = None,
    attn_impl: Optional[str] = None,
    use_remat: bool = False,
):
    embeds = params["language_model"]["embed_tokens"][input_ids]
    if pixel_values is not None and input_ids.shape[1] > 1:
        tile_feats = mllava_model.encode_images(
            params, cfg, pixel_values, attn_impl=attn_impl,
            use_remat=use_remat)
        if first_tile_idx is None:
            first_tile_idx = jnp.arange(tile_feats.shape[0])
        feats = assemble_image_features(
            params, cfg, tile_feats, first_tile_idx, assembly_indices)
        embeds = mllava_model.merge_image_features(
            embeds, input_ids, feats, cfg.image_token_index)

    logits, new_cache = llama.forward(
        params["language_model"], cfg.text_config,
        inputs_embeds=embeds, positions=positions,
        segment_ids=segment_ids, kv_cache=kv_cache, attn_impl=attn_impl,
        use_remat=use_remat)
    loss = None
    if labels is not None:
        mask = None if segment_ids is None else (segment_ids != 0)
        loss = mllava_model.cross_entropy_loss(
            logits, labels, mask, cfg.ignore_index)
    return logits, loss, new_cache
