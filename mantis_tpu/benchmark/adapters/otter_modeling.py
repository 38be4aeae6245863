"""Minimal executable Flamingo-over-MPT for the Otter eval baselines.

The reference cannot load ``OtterForConditionalGeneration`` from any
package, so it vendors the whole ~12.8K-LoC model tree
(reference: mllm_tools/model_utils/otter/models/otter/modeling_otter.py)
purely so that the ``otterimage``/``ottervideo`` eval wrappers run
self-contained.  This module is the TPU repo's equivalent: a compact
torch implementation of the same architecture family —

- a ViT vision encoder consuming ``vision_x[B, N, T, C, H, W]``
  (images batch on N, video frames on T — reference
  modeling_otter.py:1002-1012 ``_encode_vision_x``),
- a perceiver resampler with learned latents + frame embeddings
  (reference modeling_otter.py:133-212 ``OtterPerceiverResampler``),
- a decoder-only LM with zero-init tanh-gated cross-attention inserted
  every ``cross_attn_every_n_layers`` layers, text tokens attending
  only to the **most recent preceding** ``<image>`` position's latents
  (reference modeling_otter.py:214-458 ``OtterMaskedCrossAttention``:
  ``media_locations.cumsum(dim=-1)`` equality mask with
  ``only_attend_immediate_media=True``; :461-492 layer wiring),
- an HF ``generate(vision_x=..., lang_x=...)`` front-end so the eval
  wrapper's beam-3 / no_repeat_ngram / bad_words call runs unmodified
  (reference otter_image.py:70-82).

Sized for tiny random weights: this is an eval *baseline harness*
(torch, CPU), not part of the TPU compute path.  Numerical parity with
the released Otter checkpoints is a non-goal (no egress); structural
and interface parity is the point, so the wrappers EXECUTE.
"""

from __future__ import annotations

import math
from typing import List, Optional

import torch
import torch.nn as nn
import torch.nn.functional as F
from transformers import PretrainedConfig, PreTrainedModel
from transformers.generation import GenerationMixin
from transformers.modeling_outputs import CausalLMOutputWithPast


class OtterMiniConfig(PretrainedConfig):
    model_type = "otter-mini"

    def __init__(self, vocab_size=96, hidden_size=32, num_heads=4,
                 num_layers=2, cross_attn_every_n_layers=1,
                 vision_hidden_size=24, image_size=64, patch_size=16,
                 resampler_latents=4, resampler_max_frames=32,
                 media_token_id=4, pad_token_id=0, bos_token_id=1,
                 eos_token_id=2, **kw):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_heads = num_heads
        self.num_layers = num_layers
        self.cross_attn_every_n_layers = cross_attn_every_n_layers
        self.vision_hidden_size = vision_hidden_size
        self.image_size = image_size
        self.patch_size = patch_size
        self.resampler_latents = resampler_latents
        self.resampler_max_frames = resampler_max_frames
        self.media_token_id = media_token_id
        super().__init__(pad_token_id=pad_token_id,
                         bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kw)


class _TinyViT(nn.Module):
    """Patch embed + one pre-LN self-attn block (CLIP-ViT shape)."""

    def __init__(self, cfg: OtterMiniConfig):
        super().__init__()
        d = cfg.vision_hidden_size
        self.patch = nn.Conv2d(3, d, cfg.patch_size, cfg.patch_size)
        self.ln1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, 2, batch_first=True)
        self.ln2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(nn.Linear(d, 2 * d), nn.GELU(),
                                 nn.Linear(2 * d, d))

    def forward(self, px):  # [B*, C, H, W] -> [B*, v, d]
        x = self.patch(px).flatten(2).transpose(1, 2)
        h = self.ln1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        x = x + self.mlp(self.ln2(x))
        return x


class _PerceiverResampler(nn.Module):
    """Learned latents cross-attend over the T*v frame tokens of each
    media item (reference OtterPerceiverResampler: latents + frame
    embeddings, modeling_otter.py:133-212)."""

    def __init__(self, cfg: OtterMiniConfig):
        super().__init__()
        d = cfg.hidden_size
        self.proj = nn.Linear(cfg.vision_hidden_size, d)
        self.latents = nn.Parameter(torch.randn(cfg.resampler_latents, d)
                                    * 0.02)
        self.frame_embs = nn.Parameter(
            torch.randn(cfg.resampler_max_frames, d) * 0.02)
        self.attn = nn.MultiheadAttention(d, cfg.num_heads,
                                          batch_first=True)
        self.ln = nn.LayerNorm(d)

    def forward(self, feats):  # [B*N, T, v, dv] -> [B*N, R, d]
        bn, t, v, _ = feats.shape
        x = self.proj(feats) + self.frame_embs[:t, None, :]
        x = x.reshape(bn, t * v, -1)
        q = self.latents[None].expand(bn, -1, -1)
        out = self.attn(q, x, x, need_weights=False)[0]
        return self.ln(q + out)


class _GatedCrossAttn(nn.Module):
    """tanh(gate)-scaled cross-attention, gate zero-init so the fresh
    model starts as the pure LM (reference modeling_otter.py:380-430
    ``OtterGatedCrossAttentionBlock``: attn_gate/ff_gate zeros)."""

    def __init__(self, cfg: OtterMiniConfig):
        super().__init__()
        d = cfg.hidden_size
        self.ln = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, cfg.num_heads,
                                          batch_first=True)
        self.gate = nn.Parameter(torch.zeros(1))

    def forward(self, x, media, media_mask):
        # media: [B, N*R, d]; media_mask: [B, S, N*R] True = masked out
        h = self.ln(x)
        # rows with every key masked produce NaNs in torch MHA; such
        # rows (text before any <image>) must pass through unchanged
        all_masked = media_mask.all(-1)
        safe_mask = media_mask & ~all_masked[..., None]
        attn_mask = safe_mask[:, None].expand(
            -1, self.attn.num_heads, -1, -1).reshape(
            -1, x.shape[1], media.shape[1])
        out = self.attn(h, media, media, attn_mask=attn_mask,
                        need_weights=False)[0]
        out = torch.where(all_masked[..., None], 0.0, out)
        return x + torch.tanh(self.gate) * out


class _DecoderBlock(nn.Module):
    """MPT-style pre-LN causal self-attn + MLP."""

    def __init__(self, cfg: OtterMiniConfig):
        super().__init__()
        d = cfg.hidden_size
        self.ln1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, cfg.num_heads,
                                          batch_first=True)
        self.ln2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(nn.Linear(d, 4 * d), nn.GELU(),
                                 nn.Linear(4 * d, d))

    def forward(self, x, causal_mask):
        h = self.ln1(x)
        x = x + self.attn(h, h, h, attn_mask=causal_mask,
                          need_weights=False)[0]
        return x + self.mlp(self.ln2(x))


class OtterMiniForConditionalGeneration(PreTrainedModel,
                                        GenerationMixin):
    """Drop-in for the vendored OtterForConditionalGeneration's eval
    surface: ``generate(vision_x=, lang_x=, attention_mask=, ...)``."""

    config_class = OtterMiniConfig
    main_input_name = "input_ids"

    def __init__(self, config: OtterMiniConfig):
        super().__init__(config)
        d = config.hidden_size
        self.vision_encoder = _TinyViT(config)
        self.perceiver = _PerceiverResampler(config)
        self.embed = nn.Embedding(config.vocab_size, d)
        self.pos = nn.Parameter(torch.randn(512, d) * 0.02)
        self.xattn = nn.ModuleList()
        self.blocks = nn.ModuleList()
        for i in range(config.num_layers):
            # reference modeling_otter.py:476: x-attn before layer when
            # (layer_idx + 1) % cross_attn_every_n_layers == 0
            self.xattn.append(
                _GatedCrossAttn(config)
                if (i + 1) % config.cross_attn_every_n_layers == 0
                else None)
            self.blocks.append(_DecoderBlock(config))
        self.ln_f = nn.LayerNorm(d)
        self.lm_head = nn.Linear(d, config.vocab_size, bias=False)
        self._media: Optional[torch.Tensor] = None
        self.post_init()

    def _init_weights(self, module):
        if isinstance(module, (nn.Linear, nn.Conv2d)):
            module.weight.data.normal_(0.0, 0.02)
            if module.bias is not None:
                module.bias.data.zero_()
        elif isinstance(module, nn.Embedding):
            module.weight.data.normal_(0.0, 0.02)

    def encode_vision(self, vision_x: torch.Tensor) -> torch.Tensor:
        """[B, N, T, C, H, W] -> latents [B, N, R, d]
        (reference _encode_vision_x, modeling_otter.py:1002-1012)."""
        b, n, t = vision_x.shape[:3]
        feats = self.vision_encoder(vision_x.flatten(0, 2))
        feats = feats.reshape(b * n, t, *feats.shape[1:])
        lat = self.perceiver(feats)
        return lat.reshape(b, n, *lat.shape[1:])

    def condition_media(self, vision_x: torch.Tensor):
        self._media = self.encode_vision(vision_x)

    def forward(self, input_ids, attention_mask=None, labels=None,
                vision_x=None, **kw):
        if vision_x is not None:
            self.condition_media(vision_x)
        b, s = input_ids.shape
        media = self._media
        if media is None:
            raise ValueError("no media conditioned; pass vision_x")
        if media.shape[0] != b:  # beam search expands the text batch
            media = media.repeat_interleave(b // media.shape[0], dim=0)
        n, r = media.shape[1:3]
        media_flat = media.reshape(b, n * r, -1)

        # Flamingo media mask: token i attends to latents of media n
        # iff n is the count of <image> tokens at positions <= i
        # (reference OtterMaskedCrossAttention media_locations.cumsum,
        # modeling_otter.py:214-280, only_attend_immediate_media)
        media_count = (input_ids == self.config.media_token_id) \
            .cumsum(-1)                                   # [B, S]
        media_idx = torch.arange(1, n + 1,
                                 device=input_ids.device)  # [N]
        masked = media_count[:, :, None] != media_idx[None, None, :]
        masked = masked[:, :, :, None].expand(-1, -1, -1, r) \
            .reshape(b, s, n * r)

        x = self.embed(input_ids) + self.pos[:s]
        causal = torch.triu(
            torch.full((s, s), float("-inf"),
                       device=input_ids.device), 1)
        for xa, blk in zip(self.xattn, self.blocks):
            if xa is not None:
                x = xa(x, media_flat, masked)
            x = blk(x, causal)
        logits = self.lm_head(self.ln_f(x))
        loss = None
        if labels is not None:
            loss = F.cross_entropy(logits[:, :-1].flatten(0, 1),
                                   labels[:, 1:].flatten())
        return CausalLMOutputWithPast(loss=loss, logits=logits)

    def prepare_inputs_for_generation(self, input_ids,
                                      attention_mask=None, **kw):
        return {"input_ids": input_ids,
                "attention_mask": attention_mask}

    @torch.no_grad()
    def generate(self, vision_x=None, lang_x=None, **kw):
        """Reference call shape: otter_image.py:70-82."""
        if vision_x is not None:
            self.condition_media(vision_x)
        kw.pop("use_cache", None)
        return super().generate(input_ids=lang_x, use_cache=False, **kw)


class OtterMiniImageProcessor:
    """CLIP-preprocess stand-in: resize + scale to [0,1], channels
    first (enough for the wrapper's ``preprocess(...)['pixel_values']``
    call, reference otter_image.py:63-66)."""

    def __init__(self, image_size: int = 64):
        self.image_size = image_size

    def preprocess(self, images, return_tensors=None):
        import numpy as np

        out = []
        for im in images:
            im = im.convert("RGB").resize(
                (self.image_size, self.image_size))
            arr = np.asarray(im, dtype=np.float32) / 255.0
            out.append(torch.from_numpy(arr).permute(2, 0, 1))
        return {"pixel_values": torch.stack(out)}


OTTER_SPECIALS = ["<pad>", "<s>", "</s>", "<unk>", "<image>",
                  "<answer>", "<|endofchunk|>"]


def build_otter_tokenizer(extra_texts: List[str] = ()):
    """WordLevel tokenizer whose special tokens split mid-string, so
    ``<image>User: ... GPT:<answer>`` tokenizes like the real Otter
    tokenizer (media token id recoverable, parse markers round-trip)."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {t: i for i, t in enumerate(OTTER_SPECIALS)}
    seed = ["User: GPT: what is this a b c yes no answer the in of"]
    for text in list(seed) + list(extra_texts):
        for w in text.split():
            vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", bos_token="<s>",
        eos_token="</s>", unk_token="<unk>",
        additional_special_tokens=["<image>", "<answer>",
                                   "<|endofchunk|>"])


def build_tiny_otter(extra_texts: List[str] = ()):
    """One-call harness: (model, tokenizer, image_processor) sized for
    CPU execution over random weights — the executable equivalent of
    the reference's vendored-tree load (otter_image.py:30-45)."""
    tok = build_otter_tokenizer(extra_texts)
    cfg = OtterMiniConfig(
        vocab_size=max(len(tok), 96),
        media_token_id=tok.convert_tokens_to_ids("<image>"),
        pad_token_id=tok.pad_token_id, bos_token_id=tok.bos_token_id,
        eos_token_id=tok.eos_token_id)
    torch.manual_seed(0)
    model = OtterMiniForConditionalGeneration(cfg).eval()
    return model, tok, OtterMiniImageProcessor(cfg.image_size)
