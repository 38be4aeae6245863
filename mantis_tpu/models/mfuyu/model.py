"""MFuyu — encoder-free multi-image Fuyu (Mantis-8B-Fuyu).

Reference: mantis/models/mfuyu/modeling_mfuyu.py:167-228.  Raw 30x30
pixel patches go through a single linear ``vision_embed_tokens`` into
the Persimmon decoder; multi-image prompts use BOI/EOI separators and
``<0x04>`` begin-of-answer (processor.py:343-376; conv_mfuyu_v1).

The reference's ``gather_continuous_embeddings`` (index-driven scatter,
:188-228) is replaced by the static cumsum-gather merge keyed on the
image-placeholder token id (processor pre-places one placeholder per
patch plus newline tokens per row).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from mantis_tpu.models import persimmon
from mantis_tpu.models.llama import KVCache
from mantis_tpu.models.mllava.model import (
    cross_entropy_loss,
    merge_image_features,
)
from mantis_tpu.models.persimmon import PersimmonConfig


@dataclasses.dataclass(frozen=True)
class MFuyuConfig:
    text_config: PersimmonConfig = dataclasses.field(
        default_factory=PersimmonConfig)
    patch_size: int = 30
    num_channels: int = 3
    image_placeholder_id: int = 71011   # |SPEAKER|
    image_newline_id: int = 71019       # |NEWLINE|
    ignore_index: int = -100

    @property
    def patch_dim(self) -> int:
        return self.num_channels * self.patch_size ** 2

    @classmethod
    def from_hf_config(cls, cfg) -> "MFuyuConfig":
        get = (cfg.get if isinstance(cfg, dict)
               else lambda k, d=None: getattr(cfg, k, d))
        tc = get("text_config") or cfg
        return cls(
            text_config=PersimmonConfig.from_hf_config(tc),
            patch_size=get("patch_size", 30),
            num_channels=get("num_channels", 3),
        )


def init_params(cfg: MFuyuConfig, key, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "vision_embed_tokens": (
            jax.random.normal(
                k1, (cfg.patch_dim, cfg.text_config.hidden_size),
                jnp.float32) * 0.02).astype(dtype),
        "vision_embed_bias": jnp.zeros(
            (cfg.text_config.hidden_size,), dtype),
        "language_model": persimmon.init_params(cfg.text_config, k2,
                                                dtype),
    }


def forward(
    params,
    cfg: MFuyuConfig,
    *,
    input_ids: jax.Array,
    image_patches: Optional[jax.Array] = None,   # [Np, patch_dim]
    positions: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    kv_cache: Optional[KVCache] = None,
    attn_impl: Optional[str] = None,
    use_remat: bool = False,
):
    embeds = params["language_model"]["embed_tokens"][input_ids]
    if image_patches is not None and input_ids.shape[1] > 1:
        patch_embeds = (
            image_patches.astype(params["vision_embed_tokens"].dtype)
            @ params["vision_embed_tokens"]
            + params["vision_embed_bias"])
        embeds = merge_image_features(
            embeds, input_ids, patch_embeds[:, None, :],
            cfg.image_placeholder_id)
    logits, new_cache = persimmon.forward(
        params["language_model"], cfg.text_config, inputs_embeds=embeds,
        positions=positions, segment_ids=segment_ids, kv_cache=kv_cache,
        attn_impl=attn_impl, use_remat=use_remat)
    loss = None
    if labels is not None:
        mask = None if segment_ids is None else (segment_ids != 0)
        loss = cross_entropy_loss(logits, labels, mask, cfg.ignore_index)
    return logits, loss, new_cache


# ---------------------------------------------------------------------------
# Patchification (host-side)
# ---------------------------------------------------------------------------

def patchify(image: Image.Image, patch_size: int = 30,
             max_height: int = 1080, max_width: int = 1920):
    """Resize (downscale only) into max bounds, pad to patch multiples,
    patchify row-major.

    -> (patches [rows*cols, 3*ps*ps] float32 in [-1, 1],
        rows, cols)."""
    image = image.convert("RGB")
    w, h = image.size
    scale = min(max_width / w, max_height / h, 1.0)
    nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
    image = image.resize((nw, nh), Image.Resampling.BILINEAR)
    rows = -(-nh // patch_size)
    cols = -(-nw // patch_size)
    # HF FuyuImageProcessor pads with constant 1.0 BEFORE the 1/255
    # rescale, so the padded region the checkpoint saw in training
    # normalizes to (1/255 - 0.5)/0.5 = -0.9922, not "white" +1.0
    canvas = np.full((rows * patch_size, cols * patch_size, 3),
                     1.0 / 255.0, np.float32)
    arr = np.asarray(image, np.float32) / 255.0
    canvas[:nh, :nw] = arr
    canvas = (canvas - 0.5) / 0.5
    patches = canvas.reshape(rows, patch_size, cols, patch_size, 3)
    patches = patches.transpose(0, 2, 1, 3, 4).reshape(
        rows * cols, patch_size * patch_size * 3)
    # channel-last flatten matches HF Fuyu patchify (h, w, c order)
    return patches.astype(np.float32), rows, cols


def image_token_ids(rows: int, cols: int, cfg: MFuyuConfig):
    """Per-image token block: cols placeholders + newline per row."""
    out = []
    for _ in range(rows):
        out.extend([cfg.image_placeholder_id] * cols)
        out.append(cfg.image_newline_id)
    return out
