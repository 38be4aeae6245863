"""Per-architecture eval adapters: from_pretrained + greedy generate.

Fills the reference's adapter registry for the in-repo families
(reference: mantis/mllm_tools/__init__.py:4-60 — idefics2/idefics3/
qwenVL/fuyu/openflamingo wrappers, each exposing ``support_multi_image``
and ``__call__(messages) -> str`` with greedy ``max_new_tokens=4096``
decode, mllm_tools/mllava_eval.py:51-55).

Every adapter shares :class:`GenericChat`: build the conversation
prompt with ``<image>`` markers, run the arch processor, and drive the
jitted bucketed-prefill + while_loop decode (generation/sampler.py)
through an arch ``gen_forward`` wrapper that maps the generic
(input_ids, pixel_values, positions, …) call onto the arch's forward.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from PIL import Image

import jax.numpy as jnp

from mantis_tpu.generation.sampler import GenerationConfig, generate
from mantis_tpu.models.conversation import conv_templates


def load_video_frames(video, num_frames: int):
    """Uniform frame sampling (the MVBench protocol); accepts a path
    or a pre-decoded frame list, pads short clips by repeating the
    last frame so token counts stay static.  Raises on clips that
    yield no frames — a silently dropped video would let the model
    answer without ever seeing it."""
    if not isinstance(video, str):
        frames = [im if isinstance(im, Image.Image)
                  else Image.fromarray(np.asarray(im)) for im in video]
        if len(frames) > num_frames:
            idxs = np.linspace(0, len(frames) - 1, num_frames).astype(int)
            frames = [frames[i] for i in idxs]
    else:
        import cv2

        cap = cv2.VideoCapture(video)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        idxs = np.linspace(0, max(total - 1, 0), num_frames).astype(int)
        frames = []
        for i in idxs:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
            ok, frame = cap.read()
            if ok:
                frames.append(Image.fromarray(
                    cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)))
        cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from video {video!r}")
    while len(frames) < num_frames:
        frames.append(frames[-1])
    return frames[:num_frames]


def expand_video_messages(messages, num_frames: int = 8):
    """``video`` messages -> uniformly sampled frames-as-images (the
    protocol every reference wrapper without a video tower uses);
    adapters with a real video path override before this runs."""
    out = []
    for m in messages:
        if m.get("type") == "video":
            out.extend({"type": "image", "content": f}
                       for f in load_video_frames(m["content"], num_frames))
        else:
            out.append(m)
    return out


class GenericChat:
    """messages -> prompt -> processor -> generate -> decoded text.

    ``video`` messages become uniformly sampled frames-as-images (the
    MVBench protocol); archs with a real video tower override this
    (VideoLlavaChat)."""

    video_num_frames = 8

    support_multi_image = True
    arch: str = ""
    conv_template: str = ""

    def __init__(self, cfg, params, processor,
                 max_new_tokens: int = 4096, cache_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.params = params
        self.processor = processor
        self.max_new_tokens = max_new_tokens
        self.cache_dtype = cache_dtype

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16,
                        max_new_tokens: int = 4096, quantize=None):
        """quantize: None or "int8"/"int4" (or 8/4) — weight-only LM
        quantization at load time, paired with an int8 KV cache (the
        single-16GB-chip serving config for every 8B family)."""
        import transformers

        from mantis_tpu.io.hf_loader import load_checkpoint
        from mantis_tpu.train.archs import get_arch

        bits = {None: None, "int8": 8, "int4": 4, 8: 8, 4: 4}[quantize]
        arch, cfg, params = load_checkpoint(path, dtype=dtype,
                                            quantize_bits=bits)
        if arch != cls.arch:
            raise ValueError(
                f"checkpoint {path} is {arch!r}, adapter is {cls.arch!r}")
        tok = transformers.AutoTokenizer.from_pretrained(path)
        processor = get_arch(arch).make_processor(tok, cfg)
        cache_dtype = jnp.int8 if bits else jnp.bfloat16
        return cls(cfg, params, processor, max_new_tokens=max_new_tokens,
                   cache_dtype=cache_dtype)

    # ------------------------------------------------------------------
    def build_prompt(self, messages: List[dict]):
        parts, images = [], []
        for m in messages:
            if m["type"] == "image":
                im = m["content"]
                if isinstance(im, str):
                    im = Image.open(im).convert("RGB")
                images.append(im)
                parts.append("<image>")
            elif m["type"] == "video":
                frames = load_video_frames(m["content"],
                                           self.video_num_frames)
                images.extend(frames)
                parts.append("<image>" * len(frames))
            else:
                parts.append(m["content"])
        text = "".join(parts)
        conv = conv_templates[self.conv_template].copy()
        conv.messages = []
        conv.append_message(conv.roles[0], text)
        conv.append_message(conv.roles[1], "")
        return conv.get_prompt(), images

    def terminators(self):
        tok = self.processor.tokenizer
        outs = [tok.eos_token_id]
        conv = conv_templates[self.conv_template]
        for t in (conv.sep, conv.sep2):
            # templates carry separators WITH whitespace ("<|im_end|>\n")
            # while the vocab holds the bare token — check the stripped
            # form or real turn-end terminators get silently dropped
            t = (t or "").strip(" \n")
            if t and t in tok.get_vocab():
                outs.append(tok.convert_tokens_to_ids(t))
        return tuple(t for t in dict.fromkeys(outs) if t is not None)

    # arch hooks ---------------------------------------------------------
    def prepare_inputs(self, prompt: str, images):
        """-> (input_ids, attention_mask, pixel_values, extra dict)."""
        enc = self.processor(prompt, images or None, truncation=True,
                             max_length=None)
        return (enc["input_ids"], enc.get("attention_mask"),
                enc.get("pixel_values"), {})

    def gen_forward(self, params, cfg, *, input_ids, pixel_values,
                    positions, segment_ids, kv_cache, **extra):
        raise NotImplementedError

    # ------------------------------------------------------------------
    def __call__(self, messages: List[dict]) -> str:
        prompt, images = self.build_prompt(messages)
        ids, mask, pix, extra = self.prepare_inputs(prompt, images)
        gen_cfg = GenerationConfig(
            max_new_tokens=self.max_new_tokens, do_sample=False,
            eos_token_ids=self.terminators(),
            pad_token_id=self.processor.tokenizer.pad_token_id or 0)
        out = generate(
            self.params, self.cfg, self.gen_forward, ids,
            pixel_values=pix, attention_mask=mask, gen_cfg=gen_cfg,
            cache_dtype=self.cache_dtype, extra=extra)
        row = out[0]
        eos = set(gen_cfg.eos_token_ids)
        stop = len(row)
        for i, t in enumerate(row):
            if int(t) in eos:
                stop = i
                break
        return self.processor.tokenizer.decode(
            row[:stop], skip_special_tokens=True).strip()


class Idefics2Chat(GenericChat):
    arch = "idefics2"
    conv_template = "idefics_2"

    def prepare_inputs(self, prompt, images):
        enc = self.processor(prompt, images or None, truncation=True)
        extra = {}
        if "patch_mask" in enc:
            extra = {"patch_mask": enc["patch_mask"],
                     "patch_position_ids": enc["patch_position_ids"]}
        return (enc["input_ids"], enc.get("attention_mask"),
                enc.get("pixel_values"), extra)

    def gen_forward(self, params, cfg, *, input_ids, pixel_values,
                    positions, segment_ids, kv_cache,
                    patch_mask=None, patch_position_ids=None):
        from mantis_tpu.models.idefics2 import model as M

        decode = input_ids.shape[1] == 1
        return M.forward(
            params, cfg, input_ids=input_ids,
            pixel_values=None if decode else pixel_values,
            patch_mask=None if decode else patch_mask,
            patch_position_ids=None if decode else patch_position_ids,
            positions=positions, segment_ids=segment_ids,
            kv_cache=kv_cache)


class Idefics2DeltaChat(Idefics2Chat):
    """idefics2_delta: optical-flow delta images inserted between
    consecutive media before the standard idefics2 protocol (reference:
    models/idefics2_delta/modeling_idefics2.py:1213-1234 DeltaFlowModel
    — flow between consecutive pixel_values; computed host-side here,
    see mantis_tpu/models/idefics2_delta/deltas.py)."""

    arch = "idefics2_delta"

    def build_prompt(self, messages):
        from mantis_tpu.models.idefics2_delta import delta_frames

        messages = expand_video_messages(messages,
                                         self.video_num_frames)
        out, prev = [], None
        for m in messages:
            if m.get("type") == "image":
                im = m["content"]
                if isinstance(im, str):
                    im = Image.open(im).convert("RGB")
                if prev is not None:
                    out.append({"type": "image",
                                "content": delta_frames([prev, im])[0]})
                out.append({"type": "image", "content": im})
                prev = im
            else:
                out.append(m)
        return super().build_prompt(out)


class Idefics3Chat(Idefics2Chat):
    arch = "idefics3"
    conv_template = "idefics_3"

    def gen_forward(self, params, cfg, *, input_ids, pixel_values,
                    positions, segment_ids, kv_cache,
                    patch_mask=None, patch_position_ids=None):
        from mantis_tpu.models.idefics3 import model as M

        decode = input_ids.shape[1] == 1
        return M.forward(
            params, cfg, input_ids=input_ids,
            pixel_values=None if decode else pixel_values,
            patch_mask=None if decode else patch_mask,
            patch_position_ids=None if decode else patch_position_ids,
            positions=positions, segment_ids=segment_ids,
            kv_cache=kv_cache)


class InternVLChat(GenericChat):
    arch = "internvl"
    conv_template = "internvl2_5"

    def gen_forward(self, params, cfg, *, input_ids, pixel_values,
                    positions, segment_ids, kv_cache):
        from mantis_tpu.models.intern_vl import model as M

        decode = input_ids.shape[1] == 1
        return M.forward(
            params, cfg, input_ids=input_ids,
            pixel_values=None if decode else pixel_values,
            positions=positions, segment_ids=segment_ids,
            kv_cache=kv_cache)


class MFuyuChat(GenericChat):
    arch = "mfuyu"
    conv_template = "mfuyu_v1"

    def prepare_inputs(self, prompt, images):
        enc = self.processor(prompt, images or None, truncation=True)
        extra = {}
        if "image_patches" in enc:
            extra["image_patches"] = enc["image_patches"]
        return (enc["input_ids"], enc.get("attention_mask"), None, extra)

    def gen_forward(self, params, cfg, *, input_ids, pixel_values,
                    positions, segment_ids, kv_cache,
                    image_patches=None):
        from mantis_tpu.models.mfuyu import model as M

        decode = input_ids.shape[1] == 1
        return M.forward(
            params, cfg, input_ids=input_ids,
            image_patches=None if decode else image_patches,
            positions=positions, segment_ids=segment_ids,
            kv_cache=kv_cache)


class Qwen2VLChat(GenericChat):
    arch = "qwen2_vl"
    conv_template = "qwen2_vl"

    def prepare_inputs(self, prompt, images):
        from mantis_tpu.models.qwen2_vl.model import (
            get_rope_index, vision_rot_pos_ids, vision_segment_ids)

        enc = self.processor(prompt, images or None, truncation=True)
        ids = enc["input_ids"]
        b, s = ids.shape
        # pre-bucket to 128 so the host-computed M-RoPE positions match
        # the padded shapes inside the jitted loop
        sb = ((s + 127) // 128) * 128
        pad_id = self.processor.tokenizer.pad_token_id or 0
        ids_p = np.full((b, sb), pad_id, np.int64)
        ids_p[:, :s] = ids
        mask = np.zeros((b, sb), np.int64)
        mask[:, :s] = 1
        grids = enc.get("image_grid_thw")
        grid_list = ([tuple(int(x) for x in g) for g in grids]
                     if grids is not None else None)
        pos3, delta = get_rope_index(
            ids_p, np.asarray(grid_list) if grid_list else None, mask,
            self.cfg)
        extra = {"mrope_positions": pos3.astype(np.int32),
                 "rope_delta": delta.astype(np.int32)}
        if grid_list:
            extra["rot_pos_ids"] = vision_rot_pos_ids(
                grid_list, self.cfg.vision_config.spatial_merge_size)
            extra["vision_segment_ids_arr"] = vision_segment_ids(
                grid_list)
        return ids_p, mask, enc.get("pixel_values"), extra

    def engine_encode(self, messages):
        """Continuous-batching encode: (ids, media, submit_kw).

        M-RoPE prefill tables depend on the PADDED length, and the
        engine picks the prefill bucket at admission — so the media
        rides as ``media_fn(bucket)``; the decode-side vision-span
        compression delta (HF rope_deltas) rides as ``pos_offset`` on
        the slot (padding-invariant: delta = next_pos - n_valid)."""
        from mantis_tpu.models.qwen2_vl.model import (
            get_rope_index, vision_rot_pos_ids, vision_segment_ids)

        prompt, images = self.build_prompt(messages)
        enc = self.processor(prompt, images or None, truncation=True)
        ids = [int(t) for t in np.asarray(enc["input_ids"])[0]]
        grids = enc.get("image_grid_thw")
        if grids is None:
            # no vision spans: M-RoPE == standard RoPE at arange
            # positions (the engine default) and delta == 0
            return ids, None, {}
        grid_arr = np.asarray(
            [tuple(int(x) for x in g) for g in grids])
        grid_list = [tuple(g) for g in grid_arr]
        pix = enc["pixel_values"]
        rot = vision_rot_pos_ids(
            grid_list, self.cfg.vision_config.spatial_merge_size)
        vseg = vision_segment_ids(grid_list)
        n = len(ids)
        pad_id = self.processor.tokenizer.pad_token_id or 0
        _, delta = get_rope_index(
            np.asarray([ids], np.int64), grid_arr, None, self.cfg)

        def media_fn(bucket: int):
            ids_p = np.full((1, bucket), pad_id, np.int64)
            ids_p[0, :n] = ids
            mask = np.zeros((1, bucket), np.int64)
            mask[0, :n] = 1
            pos3, _ = get_rope_index(ids_p, grid_arr, mask, self.cfg)
            return {"pixel_values": pix, "rot_pos_ids": rot,
                    "vision_segment_ids_arr": vseg,
                    "mrope_positions": pos3.astype(np.int32)}

        # media is None on purpose: media_fn always wins at _admit_one,
        # and the only other consumer (prefix-cache image hashing) is
        # unreachable because media_fn + max_cached_prefixes is refused
        # — a pixel_values dict here would just ride the request dead
        return ids, None, {
            "media_fn": media_fn, "pos_offset": int(delta[0, 0])}

    def gen_forward(self, params, cfg, *, input_ids, pixel_values,
                    positions, segment_ids, kv_cache,
                    mrope_positions=None, rope_delta=None,
                    rot_pos_ids=None, vision_segment_ids_arr=None):
        from mantis_tpu.models.qwen2_vl import model as M

        decode = input_ids.shape[1] == 1
        if decode:
            if rope_delta is not None:
                # serial path: all three axes advance together, shifted
                # by the prompt's vision-span compression delta
                pos = positions[None] + rope_delta[None]
                pos = jnp.broadcast_to(pos, (3, *positions.shape))
            else:
                # engine path: the per-slot delta is already folded into
                # ``positions`` (pos_offset); 2-D positions with equal
                # t/h/w axes yield the same rotary tables as the 3-D
                # broadcast (llama.rope_cos_sin chunk-from-axis j%3)
                pos = positions
            pv = rp = vs = None
        else:
            # mrope_positions rides the media pytree on the engine path;
            # a text-only prompt has no vision spans, so the engine's
            # default arange positions are exactly its M-RoPE positions
            pos = mrope_positions if mrope_positions is not None \
                else positions
            pv, rp, vs = pixel_values, rot_pos_ids, vision_segment_ids_arr
        return M.forward(
            params, cfg, input_ids=input_ids, pixel_values=pv,
            rot_pos_ids=rp, vision_segment_ids_arr=vs, positions=pos,
            segment_ids=segment_ids, kv_cache=kv_cache)


class OpenFlamingoChat(GenericChat):
    """No kv-cache in the flamingo forward (media kv are cross-attended,
    not cached yet): greedy decode re-runs the bucketed full forward per
    token — correct, slower; fine for eval batch-1."""

    arch = "openflamingo"
    conv_template = "openflamingo"

    def __call__(self, messages):
        from mantis_tpu.models.openflamingo import model as M

        prompt, images = self.build_prompt(messages)
        enc = self.processor(prompt, images or None, truncation=True)
        ids = list(enc["input_ids"][0])
        pix = enc.get("pixel_values")
        pv = jnp.asarray(pix) if pix is not None else None
        tok = self.processor.tokenizer
        eos = set(self.terminators())
        out_ids = []
        import functools

        import jax

        if not hasattr(self, "_step_jit"):
            # jit ONCE per adapter with pixel_values as an argument —
            # a per-call closure would retrace/recompile the full
            # forward for every eval example
            @functools.partial(jax.jit, static_argnames=("num_media",
                                                         "has_pv"))
            def _step(params, ids_arr, seg, pv, *, num_media, has_pv):
                logits, _, _ = M.forward(
                    params, self.cfg, input_ids=ids_arr,
                    pixel_values=pv if has_pv else None,
                    num_media=num_media, segment_ids=seg)
                return logits

            self._step_jit = _step

        def step(params, ids_arr, seg):
            return self._step_jit(
                params, ids_arr, seg, pv,
                num_media=len(images) if images else 1,
                has_pv=pv is not None)

        max_new = self.max_new_tokens
        for _ in range(max_new):
            sb = ((len(ids) + 127) // 128) * 128
            arr = np.full((1, sb), tok.pad_token_id or 0, np.int64)
            arr[0, :len(ids)] = ids
            seg = np.zeros((1, sb), np.int32)
            seg[0, :len(ids)] = 1
            logits = step(self.params, jnp.asarray(arr),
                          jnp.asarray(seg))
            nxt = int(jnp.argmax(logits[0, len(ids) - 1]))
            if nxt in eos:
                break
            out_ids.append(nxt)
            ids.append(nxt)
        return tok.decode(out_ids, skip_special_tokens=True).strip()


class VideoLlavaChat(GenericChat):
    """Video-LLaVA adapter (reference protocol:
    mllm_tools/videollava_eval wrappers).  Handles ``image`` messages
    through the image tower and ``video`` messages (a path or a frame
    list) through the video tower via ``pixel_values_videos``."""

    arch = "videollava"
    conv_template = "idefics_2"

    def build_prompt(self, messages: List[dict]):
        parts, images, videos = [], [], []
        for m in messages:
            if m["type"] == "image":
                im = m["content"]
                if isinstance(im, str):
                    im = Image.open(im).convert("RGB")
                images.append(im)
                parts.append("<image>")
            elif m["type"] == "video":
                videos.append(self._load_frames(m["content"]))
                parts.append("<video>")
            else:
                parts.append(m["content"])
        text = "".join(parts)
        conv = conv_templates[self.conv_template].copy()
        conv.messages = []
        conv.append_message(conv.roles[0], text)
        conv.append_message(conv.roles[1], "")
        if not hasattr(self, "_tls"):
            import threading

            self._tls = threading.local()
        self._tls.videos = videos   # per-thread: the adapter is shared
        # across engine/eval threads (GenericEngineAdapter)
        return conv.get_prompt(), images

    def _load_frames(self, video):
        # token count is static: num_frames * (patches + 1)
        return load_video_frames(video, self.cfg.num_frames)

    def prepare_inputs(self, prompt, images):
        videos = getattr(getattr(self, "_tls", None), "videos", [])
        enc = self.processor(prompt, images or None,
                             videos=videos or None, truncation=True,
                             add_image_ids=False)
        extra = {}
        if "pixel_values_videos" in enc:
            extra["pixel_values_videos"] = enc["pixel_values_videos"]
        return (enc["input_ids"], enc.get("attention_mask"),
                enc.get("pixel_values"), extra)

    def gen_forward(self, params, cfg, *, input_ids, pixel_values,
                    positions, segment_ids, kv_cache,
                    pixel_values_videos=None):
        from mantis_tpu.models.videollava import model as M

        decode = input_ids.shape[1] == 1
        return M.forward(
            params, cfg, input_ids=input_ids,
            pixel_values=None if decode else pixel_values,
            pixel_values_videos=(None if decode
                                 else pixel_values_videos),
            positions=positions, segment_ids=segment_ids,
            kv_cache=kv_cache)


class MLlavaNextChat(GenericChat):
    """LLaVA-NeXT (anyres) adapter (reference:
    mllm_tools/llava_eval.py llava-next branch)."""

    arch = "mllava_next"
    conv_template = "llama_3"

    def prepare_inputs(self, prompt, images):
        enc = self.processor(prompt, images or None, truncation=True,
                             add_image_ids=True)
        extra = {}
        if "pixel_values" in enc:
            counts = enc["tiles_per_image"]
            extra["first_tile_idx"] = np.concatenate(
                [[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        return (enc["input_ids"], enc.get("attention_mask"),
                enc.get("pixel_values"), extra)

    def gen_forward(self, params, cfg, *, input_ids, pixel_values,
                    positions, segment_ids, kv_cache,
                    first_tile_idx=None):
        from mantis_tpu.models.mllava_next import model as M

        decode = input_ids.shape[1] == 1
        return M.forward(
            params, cfg, input_ids=input_ids,
            pixel_values=None if decode else pixel_values,
            first_tile_idx=None if decode else first_tile_idx,
            positions=positions, segment_ids=segment_ids,
            kv_cache=kv_cache)


ARCH_CHAT_CLASSES = {
    c.arch: c for c in (Idefics2Chat, Idefics2DeltaChat, Idefics3Chat,
                        InternVLChat, MFuyuChat, Qwen2VLChat,
                        OpenFlamingoChat, VideoLlavaChat,
                        MLlavaNextChat)
}
