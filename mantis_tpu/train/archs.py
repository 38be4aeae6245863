"""Architecture registry for the multi-arch trainer.

One :class:`ArchSpec` per trainable family replaces the reference's ten
per-architecture trainer scripts (reference: mantis/train/train_*.py) —
each script there repeats the same skeleton with a different model
load, freezing policy, and data plumbing; here those differences live
in one declarative spec consumed by ``mantis_tpu.train.train``.

Per-arch behavioral notes carried over from the reference:
  - idefics2 ignores image-token labels (the reference sets the CE
    ignore index to the image token id, train_idefics2.py:164-166; our
    processors emit -100 there directly).
  - qwen2_vl LoRA targets q/k/v/o/gate/up/down in the LM only
    (regex pattern, train_qwen2_vl.py:202).
  - internvl's cross-attn pretrain clones self-attn weights into the
    cross-attn branch and zeroes the tanh gates
    (train_intern_vl_25.py:302-318) -> :func:`internvl_clone_cross_attn`.
  - openflamingo trains ONLY the perceiver + gated cross-attn blocks
    (+ embeddings), and checkpoints save trainable params only
    (train_openflamingo.py:151-245); our TrainState already contains
    only the trainable tree, so checkpoints are trainable-only by
    construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mantis_tpu.models.configs import LlamaConfig, LlavaConfig, VisionConfig


@dataclasses.dataclass
class ArchSpec:
    name: str
    conv_template: str
    debug_config: Callable[[Any], Any]           # (tokenizer) -> cfg
    init_params: Callable[[Any, Any, Any], Any]  # (cfg, key, dtype)
    make_processor: Callable[[Any, Any], Any]    # (tokenizer, cfg)
    compute_loss: Callable[[Any, Any, Dict, Any], Any]
    trainable_pred: Callable[[str], bool]
    make_collator: Callable[[Any, Any, Dict], Any]
    lora_exclude: Tuple[str, ...] = (
        "vision_tower", "multi_modal_projector", "projector")
    prepare_params: Optional[Callable[[Any, Any], Any]] = None
    dataset_format: str = "chat"
    # archs with a <video>-token encoder path: cfg -> tokens per <video>
    # (reference data.py:763-799 use_video_encoder)
    num_video_tokens_fn: Optional[Callable[[Any], int]] = None
    # archs with a sequence-classification head (reference
    # Idefics2/Qwen2VLForSequenceClassification + --problem_type,
    # train_qwen2_vl.py:136): (cfg, key, dtype) -> params incl. score
    init_cls_params: Optional[Callable[[Any, Any, Any], Any]] = None
    # (params, cfg, batch, tcfg, problem_type=...) -> scalar loss
    compute_cls_loss: Optional[Callable] = None
    # host-side media pipeline hook applied per example (idefics2_delta:
    # flow-delta images interleaved between consecutive frames)
    media_transform: Optional[Callable] = None


ARCHS: Dict[str, ArchSpec] = {}


def register(spec: ArchSpec) -> ArchSpec:
    ARCHS[spec.name] = spec
    return spec


def get_arch(name: str) -> ArchSpec:
    return ARCHS[name]


def _vocab(tokenizer) -> int:
    return max(len(tokenizer), int(max(
        tokenizer.get_vocab().values())) + 1)


def _ensure_tokens(tokenizer, toks):
    """Add arch special tokens BEFORE the debug config reads their ids
    (an unknown token silently maps to <unk>)."""
    missing = [t for t in toks if t not in tokenizer.get_vocab()]
    if missing:
        tokenizer.add_special_tokens(
            {"additional_special_tokens": missing})


def _freeze_vision(path: str) -> bool:
    return not path.startswith(("vision_tower", "visual"))


def classification_loss(logits, class_labels, problem_type: str):
    """HF problem_type semantics (reference train_qwen2_vl_vae.py:136,
    modeling_qwen2_vl.py Qwen2VLForSequenceClassification loss switch):
    regression -> MSE; single_label -> softmax CE on the argmax target;
    multi_label -> sigmoid BCE on float targets."""
    logits = logits.astype(jnp.float32)
    y = class_labels.astype(jnp.float32)
    if problem_type == "regression":
        return jnp.mean((logits - y) ** 2)
    if problem_type == "single_label_classification":
        import jax

        tgt = jnp.argmax(y, axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(
            logp, tgt[:, None], axis=-1))
    # multi_label_classification
    import jax

    z = jax.nn.log_sigmoid(logits)
    zn = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(y * z + (1.0 - y) * zn)


def _std_collator_kwargs(args: Dict) -> Dict:
    return dict(
        seq_buckets=args.get("seq_buckets", (512, 1024, 2048, 4096, 8192)),
        image_buckets=args.get("image_buckets", (0, 1, 2, 4, 8, 16, 32)),
        context_parallel_size=args.get("context_parallel_size", 1),
    )


# ---------------------------------------------------------------------------
# mllava
# ---------------------------------------------------------------------------

def _mllava_debug_config(tokenizer):
    return LlavaConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, image_size=56,
            patch_size=14),
        text_config=LlamaConfig(
            vocab_size=_vocab(tokenizer), hidden_size=128,
            intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0),
        image_token_index=tokenizer.convert_tokens_to_ids("<image>"),
    )


def _mllava_loss(params, cfg, batch, tcfg, **kw):
    from mantis_tpu.models.mllava import model as M

    if tcfg.loss_chunk_size:
        kw.setdefault("loss_chunk_size", tcfg.loss_chunk_size)
    _, loss, _ = M.forward(
        params, cfg, input_ids=batch["input_ids"],
        pixel_values=batch.get("pixel_values"),
        positions=batch.get("positions"),
        segment_ids=batch.get("segment_ids"), labels=batch["labels"],
        use_remat=tcfg.use_remat,
        image_feature_idx=batch.get("image_feature_idx"), **kw)
    return loss


# mllava.forward accepts layer_update_hook/mlp_chunk and **kw forwards
# them: the per-layer optimizer-in-backward path (trainer.py
# make_layer_adamw8_hook) is reachable from the multi-arch CLI
_mllava_loss.supports_layer_hook = True


def _mllava_processor(tokenizer, cfg):
    from mantis_tpu.models.mllava.processor import (
        ImageProcessorConfig, MantisImageProcessor, MLlavaProcessor)

    vc = cfg.vision_config
    ip = MantisImageProcessor(
        ImageProcessorConfig.for_tower(vc.tower_type, vc.image_size))
    return MLlavaProcessor(tokenizer, ip, cfg.num_image_tokens)


def _mllava_collator(processor, cfg, args):
    from mantis_tpu.train.data import Collator

    return Collator(
        pad_token_id=processor.tokenizer.pad_token_id or 0,
        image_token_id=cfg.image_token_index,
        num_image_tokens=cfg.num_image_tokens,
        image_size=cfg.vision_config.image_size,
        **_std_collator_kwargs(args))


def _mllava_init(cfg, key, dtype):
    from mantis_tpu.models.mllava import model as M

    return M.init_params(cfg, key, dtype)


register(ArchSpec(
    name="mllava", conv_template="llama_3",
    debug_config=_mllava_debug_config, init_params=_mllava_init,
    make_processor=_mllava_processor, compute_loss=_mllava_loss,
    trainable_pred=_freeze_vision, make_collator=_mllava_collator))


# ---------------------------------------------------------------------------
# idefics2 / idefics3
# ---------------------------------------------------------------------------

def _idefics2_debug_config(tokenizer):
    from mantis_tpu.models.idefics2.model import (
        Idefics2Config, PerceiverConfig)
    from mantis_tpu.models.idefics2.processor import (
        END_OF_UTTERANCE, FAKE_IMAGE_TOKEN)

    _ensure_tokens(tokenizer,
                   [FAKE_IMAGE_TOKEN, "<image>", END_OF_UTTERANCE])
    return Idefics2Config(
        vision_config=VisionConfig(
            tower_type="siglip", hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, image_size=56,
            patch_size=14, layer_norm_eps=1e-6),
        perceiver_config=PerceiverConfig(
            resampler_n_latents=4, resampler_depth=1, hidden_size=128,
            resampler_n_heads=2, resampler_head_dim=16,
            num_key_value_heads=2),
        text_config=LlamaConfig(
            vocab_size=_vocab(tokenizer), hidden_size=128,
            intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0),
        image_token_id=tokenizer.convert_tokens_to_ids("<image>"),
    )


def _idefics2_loss(params, cfg, batch, tcfg, **kw):
    assert not kw, (
        "idefics2: context parallelism / ring vision DP not wired for "
        "this architecture (supported: mllava, internvl)")
    from mantis_tpu.models.idefics2 import model as M

    logits, loss, _ = M.forward(
        params, cfg, input_ids=batch["input_ids"],
        pixel_values=batch.get("pixel_values"),
        patch_mask=batch.get("patch_mask"),
        patch_position_ids=batch.get("patch_position_ids"),
        positions=batch.get("positions"),
        segment_ids=batch.get("segment_ids"), labels=batch["labels"],
        use_remat=tcfg.use_remat)
    return loss


def _idefics2_processor(tokenizer, cfg):
    from mantis_tpu.models.idefics2.processor import Idefics2Processor

    vc = cfg.vision_config
    return Idefics2Processor(
        tokenizer, image_size=vc.image_size, patch_size=vc.patch_size,
        image_seq_len=cfg.num_image_tokens,
        shortest_edge=max(vc.patch_size, vc.image_size // 2))


def _idefics2_collator(processor, cfg, args):
    from mantis_tpu.train.data import Collator

    return Collator(
        pad_token_id=processor.tokenizer.pad_token_id or 0,
        image_token_id=processor.image_token_index,
        num_image_tokens=cfg.num_image_tokens,
        image_size=cfg.vision_config.image_size,
        **_std_collator_kwargs(args))


def _idefics2_init(cfg, key, dtype):
    from mantis_tpu.models.idefics2 import model as M

    return M.init_params(cfg, key, dtype)


def _idefics2_cls_init(cfg, key, dtype):
    from mantis_tpu.models.idefics2 import model as M

    return M.init_classification_params(cfg, key, dtype)


def _idefics2_cls_loss(params, cfg, batch, tcfg,
                       problem_type="multi_label_classification",
                       **kw):
    assert not kw, "idefics2 classification: CP/ring-DP not wired"
    from mantis_tpu.models.idefics2 import model as M

    logits = M.forward_classification(
        params, cfg, input_ids=batch["input_ids"],
        pixel_values=batch.get("pixel_values"),
        patch_mask=batch.get("patch_mask"),
        patch_position_ids=batch.get("patch_position_ids"),
        segment_ids=batch.get("segment_ids"),
        use_remat=tcfg.use_remat)
    return classification_loss(logits, batch["class_labels"],
                               problem_type)


register(ArchSpec(
    name="idefics2", conv_template="idefics_2",
    debug_config=_idefics2_debug_config, init_params=_idefics2_init,
    make_processor=_idefics2_processor, compute_loss=_idefics2_loss,
    trainable_pred=_freeze_vision, make_collator=_idefics2_collator,
    lora_exclude=("vision_tower", "connector", "perceiver"),
    init_cls_params=_idefics2_cls_init,
    compute_cls_loss=_idefics2_cls_loss))


def _idefics2_delta_media_transform(images):
    """Optical-flow delta images interleaved between consecutive
    frames/images (reference: models/idefics2_delta/modeling_idefics2.py
    :1213-1234 DeltaFlowModel computes flow between consecutive
    pixel_values; its NeuFlow import at :1211 is a dead path — see
    mantis_tpu/models/idefics2_delta/deltas.py for the runnable
    Farneback stand-in)."""
    from mantis_tpu.models.idefics2_delta import (
        interleave_frames_and_deltas)

    return interleave_frames_and_deltas(images)


register(ArchSpec(
    # the delta variant IS the idefics2 stack (reference:
    # modeling_idefics2.py:1240-1256 Idefics2DeltaModel builds the same
    # vision/connector/text towers; DeltaFlowModel is constructed and
    # never invoked in forward — the delta images enter as extra media);
    # here the flow images are computed host-side per example and ride
    # the standard pipeline as ordinary images.
    name="idefics2_delta", conv_template="idefics_2",
    debug_config=_idefics2_debug_config, init_params=_idefics2_init,
    make_processor=_idefics2_processor, compute_loss=_idefics2_loss,
    trainable_pred=_freeze_vision, make_collator=_idefics2_collator,
    lora_exclude=("vision_tower", "connector", "perceiver"),
    init_cls_params=_idefics2_cls_init,
    compute_cls_loss=_idefics2_cls_loss,
    media_transform=_idefics2_delta_media_transform))


def _idefics3_debug_config(tokenizer):
    from mantis_tpu.models.idefics3.model import Idefics3Config
    from mantis_tpu.models.idefics2.processor import (
        END_OF_UTTERANCE, FAKE_IMAGE_TOKEN)
    from mantis_tpu.models.idefics3.processor import GLOBAL_IMG_TOKEN

    _ensure_tokens(tokenizer, [FAKE_IMAGE_TOKEN, "<image>",
                               END_OF_UTTERANCE, GLOBAL_IMG_TOKEN])
    return Idefics3Config(
        vision_config=VisionConfig(
            tower_type="siglip", hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, image_size=56,
            patch_size=14, layer_norm_eps=1e-6),
        text_config=LlamaConfig(
            vocab_size=_vocab(tokenizer), hidden_size=128,
            intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0),
        scale_factor=2,
        image_token_id=tokenizer.convert_tokens_to_ids("<image>"),
    )


def _idefics3_loss(params, cfg, batch, tcfg, **kw):
    assert not kw, (
        "idefics3: context parallelism / ring vision DP not wired for "
        "this architecture (supported: mllava, internvl)")
    from mantis_tpu.models.idefics3 import model as M

    _, loss, _ = M.forward(
        params, cfg, input_ids=batch["input_ids"],
        pixel_values=batch.get("pixel_values"),
        patch_mask=batch.get("patch_mask"),
        patch_position_ids=batch.get("patch_position_ids"),
        positions=batch.get("positions"),
        segment_ids=batch.get("segment_ids"), labels=batch["labels"],
        use_remat=tcfg.use_remat)
    return loss


def _idefics3_processor(tokenizer, cfg):
    from mantis_tpu.models.idefics3.processor import Idefics3Processor

    vc = cfg.vision_config
    return Idefics3Processor(
        tokenizer, image_size=vc.image_size, patch_size=vc.patch_size,
        image_seq_len=cfg.num_image_tokens, shortest_edge=vc.image_size)


def _idefics3_init(cfg, key, dtype):
    from mantis_tpu.models.idefics3 import model as M

    return M.init_params(cfg, key, dtype)


register(ArchSpec(
    name="idefics3", conv_template="idefics_3",
    debug_config=_idefics3_debug_config, init_params=_idefics3_init,
    make_processor=_idefics3_processor, compute_loss=_idefics3_loss,
    trainable_pred=_freeze_vision, make_collator=_idefics2_collator,
    lora_exclude=("vision_tower", "connector")))


# ---------------------------------------------------------------------------
# internvl (inline mode; cross-attn pretrain via prepare_params)
# ---------------------------------------------------------------------------

def _internvl_debug_config(tokenizer):
    from mantis_tpu.models.intern_vl.model import (
        InternViTConfig, InternVLConfig)
    from mantis_tpu.models.intern_vl.processor import (
        IMG_CONTEXT, IMG_END, IMG_START)

    _ensure_tokens(tokenizer, [IMG_START, IMG_END, IMG_CONTEXT])
    return InternVLConfig(
        vision_config=InternViTConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, image_size=56, patch_size=14),
        text_config=LlamaConfig(
            vocab_size=_vocab(tokenizer), hidden_size=128,
            intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0),
        image_token_id=tokenizer.convert_tokens_to_ids("<IMG_CONTEXT>"),
    )


def _internvl_loss(params, cfg, batch, tcfg, **kw):
    from mantis_tpu.models.intern_vl import model as M

    if batch.get("image_feature_idx") is not None:
        kw = dict(kw, image_feature_idx=batch["image_feature_idx"])
    _, loss, _ = M.forward(
        params, cfg, input_ids=batch["input_ids"],
        pixel_values=batch.get("pixel_values"),
        positions=batch.get("positions"),
        segment_ids=batch.get("segment_ids"), labels=batch["labels"],
        use_remat=tcfg.use_remat, **kw)
    return loss


def _internvl_processor(tokenizer, cfg):
    from mantis_tpu.models.intern_vl.processor import (
        InternVLChatProcessor)

    return InternVLChatProcessor(
        tokenizer, num_image_tokens=cfg.num_image_tokens,
        tile=cfg.vision_config.image_size, max_num=1,
        enable_cross_attention=getattr(
            cfg, "enable_cross_attention", False))


def _internvl_collator(processor, cfg, args):
    from mantis_tpu.train.data import Collator

    return Collator(
        pad_token_id=processor.tokenizer.pad_token_id or 0,
        image_token_id=cfg.image_token_id,
        num_image_tokens=cfg.num_image_tokens,
        image_size=cfg.vision_config.image_size,
        **_std_collator_kwargs(args))


def _internvl_init(cfg, key, dtype):
    from mantis_tpu.models.intern_vl import model as M

    return M.init_params(cfg, key, dtype)


def internvl_clone_cross_attn(params, cfg):
    """Cross-attn pretrain init: clone self-attn q/k/v/o into the
    cross-attn branch, keep gates at zero (reference:
    train_intern_vl_25.py:302-318)."""
    if "cross_attention" not in params:
        return params
    layers = params["language_model"]["layers"]
    xa = dict(params["cross_attention"])
    for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
        xa[name] = jnp.array(layers[name], copy=True)
    xa["attn_gate"] = jnp.zeros_like(xa["attn_gate"])
    return dict(params, cross_attention=xa)


register(ArchSpec(
    name="internvl", conv_template="internvl2_5",
    debug_config=_internvl_debug_config, init_params=_internvl_init,
    make_processor=_internvl_processor, compute_loss=_internvl_loss,
    trainable_pred=_freeze_vision, make_collator=_internvl_collator,
    lora_exclude=("vision_tower", "projector"),
    prepare_params=internvl_clone_cross_attn))


# ---------------------------------------------------------------------------
# qwen2_vl (M-RoPE positions computed in a dedicated collator)
# ---------------------------------------------------------------------------

def _qwen2_debug_config(tokenizer):
    from mantis_tpu.models.qwen2_vl.model import (
        Qwen2VLConfig, Qwen2VLVisionConfig)
    from mantis_tpu.models.qwen2_vl.processor import (
        IMAGE_PAD, VIDEO_PAD, VISION_END, VISION_START)

    _ensure_tokens(tokenizer,
                   [VISION_START, VISION_END, IMAGE_PAD, VIDEO_PAD])
    return Qwen2VLConfig(
        vision_config=Qwen2VLVisionConfig(
            depth=2, embed_dim=64, num_heads=4, patch_size=14,
            temporal_patch_size=2, spatial_merge_size=2,
            hidden_size=128),
        text_config=LlamaConfig(
            vocab_size=_vocab(tokenizer), hidden_size=128,
            intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=1e6, mrope_section=(4, 6, 6),
            attention_bias=True),  # Qwen2 always has qkv biases
        image_token_id=tokenizer.convert_tokens_to_ids("<|image_pad|>"),
        video_token_id=tokenizer.convert_tokens_to_ids("<|video_pad|>"),
        vision_start_token_id=tokenizer.convert_tokens_to_ids(
            "<|vision_start|>"),
    )


def _qwen2_loss(params, cfg, batch, tcfg, **kw):
    assert not kw, (
        "qwen2_vl: context parallelism / ring vision DP not wired for "
        "this architecture (supported: mllava, internvl)")
    from mantis_tpu.models.qwen2_vl import model as M

    _, loss, _ = M.forward(
        params, cfg, input_ids=batch["input_ids"],
        pixel_values=batch.get("pixel_values"),
        rot_pos_ids=batch.get("rot_pos_ids"),
        vision_segment_ids_arr=batch.get("vision_segment_ids_arr"),
        positions=batch.get("positions"),
        segment_ids=batch.get("segment_ids"), labels=batch["labels"],
        use_remat=tcfg.use_remat)
    return loss


def _qwen2_processor(tokenizer, cfg):
    from mantis_tpu.models.qwen2_vl.processor import Qwen2VLProcessor

    vc = cfg.vision_config
    return Qwen2VLProcessor(
        tokenizer, patch_size=vc.patch_size,
        merge_size=vc.spatial_merge_size,
        temporal=vc.temporal_patch_size)


class Qwen2VLCollator:
    """Base collation + M-RoPE [3, B, S] positions and vision-tower
    rotary/segment inputs derived from the batch's image grids."""

    def __init__(self, base, cfg):
        self.base = base
        self.cfg = cfg

    def __call__(self, examples):
        from mantis_tpu.models.qwen2_vl.model import (
            get_rope_index, vision_rot_pos_ids, vision_segment_ids)

        batch = self.base(examples)
        if "label_token_positions" in examples[0]:
            # special-token pooling positions (right-padding keeps
            # per-row indices valid)
            batch["label_token_positions"] = np.stack(
                [e["label_token_positions"] for e in examples])
            if int(batch["label_token_positions"].max()) >= \
                    batch["input_ids"].shape[1]:
                # truncation cut the trailing <|LABEL_i|> tokens; the
                # gather would silently clamp and pool garbage
                raise ValueError(
                    "label special tokens truncated away (sequence "
                    "exceeds the largest seq bucket) — raise "
                    "--max_seq_len")
        grids = batch.pop("image_grid_thw", None)
        mask = (batch["segment_ids"] != 0).astype(np.int64)
        if grids is not None and len(grids):
            grid_list = [tuple(int(x) for x in g) for g in grids]
            pos, _ = get_rope_index(
                batch["input_ids"], np.asarray(grid_list), mask, self.cfg)
            batch["rot_pos_ids"] = vision_rot_pos_ids(
                grid_list, self.cfg.vision_config.spatial_merge_size)
            batch["vision_segment_ids_arr"] = vision_segment_ids(
                grid_list)
        else:
            pos, _ = get_rope_index(batch["input_ids"], None, mask,
                                    self.cfg)
        batch["positions"] = pos
        return batch


def _qwen2_collator(processor, cfg, args):
    from mantis_tpu.train.data import Collator

    kw = _std_collator_kwargs(args)
    kw["image_buckets"] = (0,)  # exact counts; grids forbid pad images
    base = Collator(
        pad_token_id=processor.tokenizer.pad_token_id or 0,
        image_token_id=cfg.image_token_id, num_image_tokens=1, **kw)
    return Qwen2VLCollator(base, cfg)


def _qwen2_init(cfg, key, dtype):
    from mantis_tpu.models.qwen2_vl import model as M

    return M.init_params(cfg, key, dtype)


def _qwen2_cls_init(cfg, key, dtype):
    from mantis_tpu.models.qwen2_vl import model as M

    return M.init_classification_params(cfg, key, dtype)


def _qwen2_cls_loss(params, cfg, batch, tcfg,
                    problem_type="multi_label_classification", **kw):
    assert not kw, "qwen2_vl classification: CP/ring-DP not wired"
    from mantis_tpu.models.qwen2_vl import model as M

    logits = M.forward_classification(
        params, cfg, input_ids=batch["input_ids"],
        pixel_values=batch.get("pixel_values"),
        rot_pos_ids=batch.get("rot_pos_ids"),
        vision_segment_ids_arr=batch.get("vision_segment_ids_arr"),
        positions=batch.get("positions"),
        segment_ids=batch.get("segment_ids"),
        label_token_positions=batch.get("label_token_positions"),
        use_remat=tcfg.use_remat)
    return classification_loss(logits, batch["class_labels"],
                               problem_type)


register(ArchSpec(
    name="qwen2_vl", conv_template="qwen2_vl",
    debug_config=_qwen2_debug_config, init_params=_qwen2_init,
    make_processor=_qwen2_processor, compute_loss=_qwen2_loss,
    trainable_pred=_freeze_vision, make_collator=_qwen2_collator,
    lora_exclude=("visual",),
    init_cls_params=_qwen2_cls_init,
    compute_cls_loss=_qwen2_cls_loss))


# ---------------------------------------------------------------------------
# mfuyu
# ---------------------------------------------------------------------------

def _mfuyu_debug_config(tokenizer):
    from mantis_tpu.models.mfuyu.model import MFuyuConfig
    from mantis_tpu.models.persimmon import PersimmonConfig

    _ensure_tokens(tokenizer, ["|SPEAKER|", "|NEWLINE|", "<image>",
                               "<boi>", "<eoi>", "<0x04>",
                               "|ENDOFTEXT|"])
    return MFuyuConfig(
        text_config=PersimmonConfig(
            vocab_size=_vocab(tokenizer), hidden_size=64,
            intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4),
        patch_size=30,
        image_placeholder_id=tokenizer.convert_tokens_to_ids("|SPEAKER|"),
        image_newline_id=tokenizer.convert_tokens_to_ids("|NEWLINE|"),
    )


def _mfuyu_loss(params, cfg, batch, tcfg, **kw):
    assert not kw, (
        "mfuyu: context parallelism / ring vision DP not wired for "
        "this architecture (supported: mllava, internvl)")
    from mantis_tpu.models.mfuyu import model as M

    _, loss, _ = M.forward(
        params, cfg, input_ids=batch["input_ids"],
        image_patches=batch.get("image_patches"),
        positions=batch.get("positions"),
        segment_ids=batch.get("segment_ids"), labels=batch["labels"],
        use_remat=tcfg.use_remat)
    return loss


def _mfuyu_processor(tokenizer, cfg):
    from mantis_tpu.models.mfuyu.processor import MFuyuProcessor

    return MFuyuProcessor(tokenizer, cfg, max_height=120, max_width=120)


def _mfuyu_collator(processor, cfg, args):
    from mantis_tpu.train.data import Collator

    kw = _std_collator_kwargs(args)
    kw["image_buckets"] = (0,)
    return Collator(
        pad_token_id=processor.tokenizer.pad_token_id or 0,
        image_token_id=cfg.image_placeholder_id, num_image_tokens=1,
        **kw)


def _mfuyu_init(cfg, key, dtype):
    from mantis_tpu.models.mfuyu import model as M

    return M.init_params(cfg, key, dtype)


register(ArchSpec(
    name="mfuyu", conv_template="mfuyu_v1",
    debug_config=_mfuyu_debug_config, init_params=_mfuyu_init,
    make_processor=_mfuyu_processor, compute_loss=_mfuyu_loss,
    trainable_pred=lambda p: True,  # fuyu has no vision tower to freeze
    make_collator=_mfuyu_collator,
    lora_exclude=("vision_embed",)))


# ---------------------------------------------------------------------------
# openflamingo
# ---------------------------------------------------------------------------

def _flamingo_debug_config(tokenizer):
    from mantis_tpu.models.openflamingo.model import FlamingoConfig

    return FlamingoConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, image_size=56,
            patch_size=14),
        text_config=LlamaConfig(
            vocab_size=_vocab(tokenizer), hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0),
        cross_attn_every_n_layers=1, perceiver_depth=1,
        perceiver_num_latents=4, perceiver_heads=2, perceiver_head_dim=16,
        media_token_id=tokenizer.convert_tokens_to_ids("<image>"),
    )


def _flamingo_loss(params, cfg, batch, tcfg, **kw):
    assert not kw, (
        "openflamingo: context parallelism / ring vision DP not wired for "
        "this architecture (supported: mllava, internvl)")
    from mantis_tpu.models.openflamingo import model as M

    num_media = batch["pixel_values"].shape[0] \
        // batch["input_ids"].shape[0] if "pixel_values" in batch else 1
    _, loss, _ = M.forward(
        params, cfg, input_ids=batch["input_ids"],
        pixel_values=batch.get("pixel_values"), num_media=num_media,
        positions=batch.get("positions"),
        segment_ids=batch.get("segment_ids"), labels=batch["labels"],
        use_remat=tcfg.use_remat)
    return loss


def _flamingo_processor(tokenizer, cfg):
    from mantis_tpu.models.openflamingo.processor import (
        FlamingoProcessor)

    vc = cfg.vision_config
    return FlamingoProcessor(tokenizer, image_size=vc.image_size,
                             tower_type=vc.tower_type)


class FlamingoCollator:
    """Pads every example to the SAME media count (black frames) so the
    [B*M, ...] frame tensor reshapes statically; padded media have no
    <image> token so the media mask never exposes them."""

    def __init__(self, base, image_size):
        self.base = base
        self.image_size = image_size

    def __call__(self, examples):
        m = max((e.get("pixel_values", np.zeros((0,))).shape[0]
                 for e in examples), default=0)
        m = max(m, 1)
        padded = []
        for e in examples:
            e = dict(e)
            pix = e.get("pixel_values", np.zeros(
                (0, 3, self.image_size, self.image_size), np.float32))
            if pix.shape[0] < m:
                pad = np.zeros((m - pix.shape[0], *pix.shape[1:]),
                               np.float32)
                pix = np.concatenate([pix, pad]) if pix.size else pad
            e["pixel_values"] = pix
            padded.append(e)
        return self.base(padded)


def _flamingo_collator(processor, cfg, args):
    from mantis_tpu.train.data import Collator

    kw = _std_collator_kwargs(args)
    kw["image_buckets"] = (0,)  # per-row padding handled above
    base = Collator(
        pad_token_id=processor.tokenizer.pad_token_id or 0,
        image_token_id=cfg.media_token_id, num_image_tokens=1,
        image_size=cfg.vision_config.image_size, **kw)
    return FlamingoCollator(base, cfg.vision_config.image_size)


def _flamingo_trainable(path: str) -> bool:
    """Perceiver + gated cross-attn (+ embeddings) only
    (reference: train_openflamingo.py:151-171)."""
    return path.startswith(("perceiver", "xattn",
                            "language_model/embed_tokens"))


def _flamingo_init(cfg, key, dtype):
    from mantis_tpu.models.openflamingo import model as M

    return M.init_params(cfg, key, dtype)


register(ArchSpec(
    name="openflamingo", conv_template="openflamingo",
    debug_config=_flamingo_debug_config, init_params=_flamingo_init,
    make_processor=_flamingo_processor, compute_loss=_flamingo_loss,
    trainable_pred=_flamingo_trainable,
    make_collator=_flamingo_collator,
    lora_exclude=("vision_tower",)))


# ---------------------------------------------------------------------------
# siglip_video (contrastive; own dataset format)
# ---------------------------------------------------------------------------

def _siglip_debug_config(tokenizer):
    from mantis_tpu.models.siglip_video.model import (
        SiglipTextConfig, SiglipVideoConfig)

    return SiglipVideoConfig(
        vision_config=VisionConfig(
            tower_type="siglip", hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, image_size=56,
            patch_size=14),
        text_config=SiglipTextConfig(
            vocab_size=_vocab(tokenizer), hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4),
        num_latents=4, perceiver_depth=1, max_temporal_clip_size=4)


def _siglip_loss(params, cfg, batch, tcfg, **kw):
    assert not kw, (
        "siglip_video: context parallelism / ring vision DP not wired for "
        "this architecture (supported: mllava, internvl)")
    from mantis_tpu.models.siglip_video import model as M

    loss, _, _ = M.forward(params, cfg, input_ids=batch["input_ids"],
                           frames=batch["frames"])
    return loss


def _siglip_processor(tokenizer, cfg):
    from mantis_tpu.models.mllava.processor import (
        ImageProcessorConfig, MantisImageProcessor)

    class _Bundle:
        pass

    b = _Bundle()
    b.tokenizer = tokenizer
    b.image_processor = MantisImageProcessor(
        ImageProcessorConfig.for_tower("siglip",
                                       cfg.vision_config.image_size))
    return b


class SiglipVideoCollator:
    """Stack (input_ids, frames) pairs (reference: data.py:1879-1899)."""

    def __call__(self, examples):
        return {
            "input_ids": np.stack([e["input_ids"] for e in examples]),
            "frames": np.stack([e["frames"] for e in examples]),
        }


def _siglip_collator(processor, cfg, args):
    return SiglipVideoCollator()


def _siglip_init(cfg, key, dtype):
    from mantis_tpu.models.siglip_video import model as M

    return M.init_params(cfg, key, dtype)


register(ArchSpec(
    name="siglip_video", conv_template="plain",
    debug_config=_siglip_debug_config, init_params=_siglip_init,
    make_processor=_siglip_processor, compute_loss=_siglip_loss,
    trainable_pred=lambda p: True,
    make_collator=_siglip_collator,
    dataset_format="siglip_video"))


# ---------------------------------------------------------------------------
# videollava (reference: mantis/train/train_videollava.py — trains HF
# VideoLlavaForConditionalGeneration with use_video_encoder=True)
# ---------------------------------------------------------------------------

def _videollava_debug_config(tokenizer):
    from mantis_tpu.models.videollava.model import VideoLlavaConfig

    _ensure_tokens(tokenizer, ["<image>", "<video>"])
    return VideoLlavaConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, image_size=28,
            patch_size=14),
        text_config=LlamaConfig(
            vocab_size=_vocab(tokenizer), hidden_size=128,
            intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0),
        image_token_index=tokenizer.convert_tokens_to_ids("<image>"),
        video_token_index=tokenizer.convert_tokens_to_ids("<video>"),
        num_frames=2)


def _videollava_loss(params, cfg, batch, tcfg, **kw):
    assert not kw, (
        "videollava: context parallelism / ring vision DP not wired for "
        "this architecture (supported: mllava, internvl)")
    from mantis_tpu.models.videollava import model as M

    _, loss, _ = M.forward(
        params, cfg, input_ids=batch["input_ids"],
        pixel_values=batch.get("pixel_values"),
        pixel_values_videos=batch.get("pixel_values_videos"),
        positions=batch.get("positions"),
        segment_ids=batch.get("segment_ids"), labels=batch["labels"],
        use_remat=tcfg.use_remat,
        image_feature_idx=batch.get("image_feature_idx"))
    return loss


def _videollava_processor(tokenizer, cfg):
    from mantis_tpu.models.mllava.processor import (
        ImageProcessorConfig, MantisImageProcessor)
    from mantis_tpu.models.videollava.processor import (
        VideoLlavaProcessor)

    _ensure_tokens(tokenizer, ["<image>", "<video>"])
    vc = cfg.vision_config
    ip = MantisImageProcessor(
        ImageProcessorConfig.for_tower(vc.tower_type, vc.image_size))
    return VideoLlavaProcessor(tokenizer, ip, cfg.num_image_tokens,
                               cfg.num_video_tokens)


class VideoLlavaCollator:
    """Base collation + regroup concatenated video frames
    [sum_F, C, H, W] into clips [Nv, F, C, H, W] (fixed frames/video,
    matching the <video> expansion arithmetic)."""

    def __init__(self, base, cfg):
        self.base = base
        self.cfg = cfg

    def __call__(self, examples):
        batch = self.base(examples)
        vf = batch.pop("video_frames", None)
        if vf is not None and len(vf):
            f = self.cfg.num_frames
            assert vf.shape[0] % f == 0, (
                f"got {vf.shape[0]} frames, not a multiple of "
                f"num_frames={f}")
            batch["pixel_values_videos"] = vf.reshape(
                (-1, f) + vf.shape[1:])
        return batch


def _videollava_collator(processor, cfg, args):
    from mantis_tpu.train.data import Collator

    base = Collator(
        pad_token_id=processor.tokenizer.pad_token_id or 0,
        image_token_id=cfg.image_token_index,
        num_image_tokens=cfg.num_image_tokens,
        image_size=cfg.vision_config.image_size,
        **_std_collator_kwargs(args))
    return VideoLlavaCollator(base, cfg)


def _videollava_init(cfg, key, dtype):
    from mantis_tpu.models.videollava import model as M

    return M.init_params(cfg, key, dtype)


register(ArchSpec(
    name="videollava", conv_template="idefics_2",
    debug_config=_videollava_debug_config,
    init_params=_videollava_init,
    make_processor=_videollava_processor,
    compute_loss=_videollava_loss,
    trainable_pred=lambda p: not p.startswith(
        ("image_tower", "video_tower")),
    make_collator=_videollava_collator,
    lora_exclude=("image_tower", "video_tower",
                  "multi_modal_projector"),
    num_video_tokens_fn=lambda cfg: cfg.num_video_tokens))


# ---------------------------------------------------------------------------
# qwen2_vl_vae (reference: mantis/train/train_qwen2_vl_vae.py — Qwen2-VL
# with the ViT replaced by a frozen VAE encoder + latent patchify
# adapter; vae backbone frozen always, train_qwen2_vl_vae.py:259-262)
# ---------------------------------------------------------------------------

def _qwen2_vae_debug_config(tokenizer):
    from mantis_tpu.models.qwen2_vl.processor import (
        IMAGE_PAD, VIDEO_PAD, VISION_END, VISION_START)
    from mantis_tpu.models.qwen2_vl_vae.model import Qwen2VLVAEConfig

    _ensure_tokens(tokenizer,
                   [VISION_START, VISION_END, IMAGE_PAD, VIDEO_PAD])
    return Qwen2VLVAEConfig(
        latent_channels=4, latent_patch_size=2, spatial_merge_size=2,
        vision_hidden=32, vae_base_channels=8, vae_channel_mults=(1, 2),
        image_size=32,  # 32/2/2/2 -> 4x4 = 16 tokens per frame
        text_config=LlamaConfig(
            vocab_size=_vocab(tokenizer), hidden_size=128,
            intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=1e6, mrope_section=None),
        image_token_id=tokenizer.convert_tokens_to_ids(IMAGE_PAD))


def _qwen2_vae_loss(params, cfg, batch, tcfg, **kw):
    assert not kw, (
        "qwen2_vl_vae: context parallelism / ring vision DP not wired "
        "for this architecture (supported: mllava, internvl)")
    from mantis_tpu.models.qwen2_vl_vae import model as M

    _, loss, _ = M.forward(
        params, cfg, input_ids=batch["input_ids"],
        pixel_values=batch.get("pixel_values"),
        positions=batch.get("positions"),
        segment_ids=batch.get("segment_ids"), labels=batch["labels"],
        use_remat=tcfg.use_remat)
    return loss


def _qwen2_vae_processor(tokenizer, cfg):
    from mantis_tpu.models.qwen2_vl_vae.processor import (
        Qwen2VLVAEProcessor)

    return Qwen2VLVAEProcessor(tokenizer, cfg.image_size,
                               cfg.tokens_per_image)


def _qwen2_vae_collator(processor, cfg, args):
    from mantis_tpu.train.data import Collator

    return Collator(
        pad_token_id=processor.tokenizer.pad_token_id or 0,
        image_token_id=cfg.image_token_id,
        num_image_tokens=cfg.tokens_per_image,
        image_size=cfg.image_size,
        **_std_collator_kwargs(args))


def _qwen2_vae_init(cfg, key, dtype):
    from mantis_tpu.models.qwen2_vl_vae import model as M

    return M.init_params(cfg, key, dtype, with_vae=True)


register(ArchSpec(
    name="qwen2_vl_vae", conv_template="qwen2_vl",
    debug_config=_qwen2_vae_debug_config, init_params=_qwen2_vae_init,
    make_processor=_qwen2_vae_processor, compute_loss=_qwen2_vae_loss,
    # the VAE backbone stays frozen all the time
    # (reference train_qwen2_vl_vae.py:259-262)
    trainable_pred=lambda p: not p.startswith("vae"),
    make_collator=_qwen2_vae_collator,
    lora_exclude=("vae", "latent_patch_embed", "mlp_fc")))


# ---------------------------------------------------------------------------
# mllava_next (anyres).  NOTE: the reference *intends* this to be
# trainable via train_mllava.py --mllava_type mllava_next but that path
# is a dead ImportError upstream (SURVEY.md §2.8; train_mllava.py:219
# imports a class the package never defines) — registering it here
# fixes the reference's bug rather than replicating it.
# ---------------------------------------------------------------------------

def _mllava_next_debug_config(tokenizer):
    from mantis_tpu.models.mllava_next.model import LlavaNextConfig

    _ensure_tokens(tokenizer, ["<image>"])
    return LlavaNextConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, image_size=28,
            patch_size=14),
        text_config=LlamaConfig(
            vocab_size=_vocab(tokenizer), hidden_size=128,
            intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0),
        image_token_index=tokenizer.convert_tokens_to_ids("<image>"),
        image_grid_pinpoints=((28, 56), (56, 28), (56, 56)))


def _mllava_next_loss(params, cfg, batch, tcfg, **kw):
    assert not kw, (
        "mllava_next: context parallelism / ring vision DP not wired "
        "for this architecture (supported: mllava, internvl)")
    from mantis_tpu.models.mllava_next import model as M

    _, loss, _ = M.forward(
        params, cfg, input_ids=batch["input_ids"],
        pixel_values=batch.get("pixel_values"),
        first_tile_idx=batch.get("first_tile_idx"),
        positions=batch.get("positions"),
        segment_ids=batch.get("segment_ids"), labels=batch["labels"],
        use_remat=tcfg.use_remat)
    return loss


def _mllava_next_processor(tokenizer, cfg):
    from mantis_tpu.models.mllava.processor import (
        ImageProcessorConfig, MantisImageProcessor)
    from mantis_tpu.models.mllava_next.processor import (
        MLlavaNextProcessor)

    vc = cfg.vision_config
    ip = MantisImageProcessor(
        ImageProcessorConfig.for_tower(vc.tower_type, vc.image_size))
    return MLlavaNextProcessor(tokenizer, ip, cfg.num_image_tokens,
                               grid_pinpoints=cfg.image_grid_pinpoints)


class MLlavaNextCollator:
    """Anyres collation: tiles != images, so the standard Collator's
    image-count padding does not apply — right-pad sequences into
    buckets, concatenate tile stacks, and offset each example's
    first_tile_idx into the batch-flat tile axis."""

    def __init__(self, pad_token_id, seq_buckets):
        self.pad_token_id = pad_token_id
        self.seq_buckets = sorted(seq_buckets)

    def __call__(self, examples):
        from mantis_tpu.train.data import IGNORE_INDEX, _bucket_len

        b = len(examples)
        max_len = max(len(e["input_ids"]) for e in examples)
        tgt = _bucket_len(max_len, self.seq_buckets)
        input_ids = np.full((b, tgt), self.pad_token_id, np.int64)
        labels = np.full((b, tgt), IGNORE_INDEX, np.int64)
        segment_ids = np.zeros((b, tgt), np.int32)
        positions = np.zeros((b, tgt), np.int32)
        tiles, counts = [], []
        for i, e in enumerate(examples):
            ids = np.asarray(e["input_ids"][:tgt])
            n = len(ids)
            input_ids[i, :n] = ids
            labels[i, :n] = np.asarray(e["labels"][:n])
            segment_ids[i, :n] = 1
            positions[i, :n] = np.arange(n)
            pv = e.get("pixel_values")
            if pv is not None and len(pv):
                tiles.append(pv)
                counts.extend(int(c) for c in e["tiles_per_image"])
        out = {"input_ids": input_ids, "labels": labels,
               "segment_ids": segment_ids, "positions": positions}
        if tiles:
            out["pixel_values"] = np.concatenate(tiles)
            c = np.asarray(counts, np.int64)
            out["first_tile_idx"] = np.concatenate(
                [[0], np.cumsum(c)[:-1]])
        return out


def _mllava_next_collator(processor, cfg, args):
    kw = _std_collator_kwargs(args)
    return MLlavaNextCollator(
        pad_token_id=processor.tokenizer.pad_token_id or 0,
        seq_buckets=kw["seq_buckets"])


def _mllava_next_init(cfg, key, dtype):
    from mantis_tpu.models.mllava_next import model as M

    return M.init_params(cfg, key, dtype)


register(ArchSpec(
    name="mllava_next", conv_template="llama_3",
    debug_config=_mllava_next_debug_config,
    init_params=_mllava_next_init,
    make_processor=_mllava_next_processor,
    compute_loss=_mllava_next_loss,
    trainable_pred=_freeze_vision,
    make_collator=_mllava_next_collator))
