"""ChatSession (multi-turn KV reuse, generation/session.py): replies
must match the stateless full-reprefill chat turn for turn, while each
turn prefills only the prompt delta."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mantis_tpu.generation.session import ChatSession
from mantis_tpu.models.configs import LlamaConfig, LlavaConfig, VisionConfig
from mantis_tpu.models.mllava import model as mllava_model
from mantis_tpu.models.mllava.chat import MantisLlava
from mantis_tpu.models.mllava.processor import (
    ImageProcessorConfig,
    MantisImageProcessor,
    MLlavaProcessor,
)
from mantis_tpu.utils.debug_tokenizer import build_tokenizer_from_texts


def tiny_model(cache_dtype=jnp.float32):
    tok = build_tokenizer_from_texts(
        ["what is in this image tell me more about it the answer is "
         "USER ASSISTANT hello there"])
    cfg = LlavaConfig(
        vision_config=VisionConfig(
            tower_type="clip", hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, image_size=28,
            patch_size=14),
        text_config=LlamaConfig(
            vocab_size=max(len(tok.get_vocab()) + 4, 64), hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0),
        image_token_index=tok.convert_tokens_to_ids("<image>"),
    )
    params = mllava_model.init_params(cfg, jax.random.PRNGKey(0))
    ip = MantisImageProcessor(ImageProcessorConfig.for_tower("clip", 28))
    proc = MLlavaProcessor(tok, ip, cfg.num_image_tokens)
    return MantisLlava(cfg, params, proc, model_name="tiny-debug",
                       cache_dtype=cache_dtype)


def _img():
    from PIL import Image

    return Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (28, 28, 3), np.uint8))


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8])
def test_session_matches_stateless_chat(cache_dtype):
    model = tiny_model(cache_dtype)
    img = _img()
    turns = [("what is in this <image> ?", [img]),
             ("tell me more about it", None),
             ("hello there", None)]

    session = ChatSession(model, max_ctx=512, max_new_tokens=5,
                          delta_bucket=32)
    session_replies = []
    for t, im in turns:
        session_replies.append(session.send(t, images=im))
        # every token the session claims is cached must actually have
        # its KV written (a silent hole shifts all later positions)
        assert int(session.cache.length) == len(session.tokens)

    # stateless reference: full re-prefill each turn via model.chat
    history = None
    ref_replies = []
    all_images = []
    for t, im in turns:
        all_images.extend(im or [])
        reply, history = model.chat(
            t, list(all_images) or None, history=history,
            max_new_tokens=5)
        ref_replies.append(reply)

    assert session_replies == ref_replies, (session_replies, ref_replies)


def test_session_prefills_only_the_delta():
    model = tiny_model()
    session = ChatSession(model, max_ctx=512, max_new_tokens=4,
                          delta_bucket=32)
    session.send("what is in this <image> ?", images=[_img()])
    first = session.prefilled_tokens
    assert first > model.cfg.num_image_tokens  # full first prompt
    session.send("tell me more about it")
    assert 0 < session.prefilled_tokens < 40  # just the delta
    assert len(session.tokens) > first  # history accumulated


def test_session_context_overflow_raises():
    model = tiny_model()
    session = ChatSession(model, max_ctx=64, max_new_tokens=8)
    with pytest.raises(ValueError, match="max_ctx"):
        session.send("what is in this <image> ?", images=[_img()])
