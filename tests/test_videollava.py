"""Video-LLaVA parity vs the HF torch model (tiny random weights) +
processor behavior.

The reference trains HF ``VideoLlavaForConditionalGeneration`` directly
(reference: mantis/train/train_videollava.py), so HF is the behavioral
contract: image features drop CLS ("default" strategy), video features
keep CLS per frame, one shared projector, scatter at the <image>/<video>
placeholder runs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import torch
import transformers

from mantis_tpu.io.hf_loader import (TensorSource,
                                     videollava_params_from_hf)
from mantis_tpu.models.videollava import model as vl_model
from mantis_tpu.models.videollava.model import VideoLlavaConfig

IMG_TOK, VID_TOK = 125, 126


def _tiny_hf_cfg():
    vis = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        attn_implementation="eager")
    txt = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager")
    return transformers.VideoLlavaConfig(
        vision_config=vis, text_config=txt,
        image_token_index=IMG_TOK, video_token_index=VID_TOK,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default", num_frames=2,
        attn_implementation="eager")


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(11)
    hf_cfg = _tiny_hf_cfg()
    hf = transformers.VideoLlavaForConditionalGeneration(hf_cfg).eval()
    cfg = VideoLlavaConfig.from_hf_config(hf_cfg)
    params = videollava_params_from_hf(
        TensorSource.from_state_dict(hf.state_dict()), cfg)
    return hf, cfg, params


def test_config_token_counts(pair):
    _, cfg, _ = pair
    assert cfg.num_image_tokens == 4        # 2x2 patches, CLS dropped
    assert cfg.num_video_tokens_per_frame == 5  # CLS kept (HF quirk)
    assert cfg.num_video_tokens == 10       # 2 frames


def test_image_only_parity(pair):
    hf, cfg, params = pair
    rng = np.random.RandomState(0)
    seq = [5, 6] + [IMG_TOK] * 4 + [7, 8] + [IMG_TOK] * 4 + [9]
    ids = np.array([seq])
    pix = rng.randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values_images=torch.tensor(pix)).logits.numpy()
    ours, _, _ = vl_model.forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4,
                               rtol=2e-3)


def test_video_only_parity(pair):
    hf, cfg, params = pair
    rng = np.random.RandomState(1)
    seq = [5, 6] + [VID_TOK] * cfg.num_video_tokens + [7, 8, 9]
    ids = np.array([seq])
    vids = rng.randn(1, 2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values_videos=torch.tensor(vids)).logits.numpy()
    ours, _, _ = vl_model.forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values_videos=jnp.asarray(vids), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4,
                               rtol=2e-3)


def test_mixed_image_video_parity(pair):
    hf, cfg, params = pair
    rng = np.random.RandomState(2)
    seq = ([5] + [IMG_TOK] * 4 + [6]
           + [VID_TOK] * cfg.num_video_tokens + [7, 8])
    ids = np.array([seq])
    pix = rng.randn(1, 3, 28, 28).astype(np.float32)
    vids = rng.randn(1, 2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values_images=torch.tensor(pix),
                 pixel_values_videos=torch.tensor(vids)).logits.numpy()
    ours, _, _ = vl_model.forward(
        params, cfg, input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix),
        pixel_values_videos=jnp.asarray(vids), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4,
                               rtol=2e-3)


def test_loss_gradient_flows(pair):
    """Training-path smoke: finite loss, nonzero grads into both towers'
    projector path and the LM."""
    import jax

    _, cfg, params = pair
    rng = np.random.RandomState(3)
    seq = ([5] + [IMG_TOK] * 4 + [VID_TOK] * cfg.num_video_tokens
           + [7, 8, 9])
    ids = jnp.asarray([seq])
    labels = jnp.asarray([[-100] * (len(seq) - 3) + [7, 8, 9]])
    pix = jnp.asarray(rng.randn(1, 3, 28, 28), jnp.float32)
    vids = jnp.asarray(rng.randn(1, 2, 3, 28, 28), jnp.float32)

    def loss_fn(p):
        _, loss, _ = vl_model.forward(
            p, cfg, input_ids=ids, pixel_values=pix,
            pixel_values_videos=vids, labels=labels, attn_impl="xla")
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    g = grads["multi_modal_projector"]["linear_1"]
    assert float(jnp.abs(g).sum()) > 0
    assert float(jnp.abs(
        grads["language_model"]["embed_tokens"]).sum()) > 0


def test_processor_expansion():
    from mantis_tpu.models.mllava.processor import (ImageProcessorConfig,
                                                    MantisImageProcessor)
    from mantis_tpu.models.videollava.processor import (
        VideoLlavaProcessor)
    from PIL import Image

    tok = _mini_tokenizer()
    ip = MantisImageProcessor(
        ImageProcessorConfig.for_tower("clip", 28))
    proc = VideoLlavaProcessor(tok, ip, num_image_tokens=4,
                               num_video_tokens=10)
    img = Image.new("RGB", (40, 30), (120, 10, 200))
    frames = [Image.new("RGB", (32, 32), (i * 30, 50, 100))
              for i in range(2)]
    out = proc("USER: <image> and <video> ASSISTANT: hi",
               images=[img], videos=[frames])
    ids = out["input_ids"][0].tolist()
    img_id = proc.image_token_index
    vid_id = proc.video_token_index
    assert ids.count(img_id) == 4
    assert ids.count(vid_id) == 10
    assert out["pixel_values"].shape == (1, 3, 28, 28)
    assert out["pixel_values_videos"].shape == (1, 2, 3, 28, 28)


def _mini_tokenizer():
    """Tiny whitespace tokenizer exposing the HF surface the processor
    needs (same approach as other processor tests in this suite)."""

    class Mini:
        def __init__(self):
            self.vocab = {"<pad>": 0, "<image>": 1, "<video>": 2}
            self.pad_token_id = 0

        def get_vocab(self):
            return dict(self.vocab)

        def _id(self, w):
            if w not in self.vocab:
                self.vocab[w] = len(self.vocab)
            return self.vocab[w]

        def convert_tokens_to_ids(self, t):
            return self.vocab.get(t, 3)

        def add_special_tokens(self, d):
            for t in d.get("additional_special_tokens", []):
                self._id(t)

        def __call__(self, texts, truncation=True, max_length=None,
                     add_special_tokens=True):
            import re

            out = []
            for t in texts:
                parts = re.split(r"(<image>|<video>)", t)
                ids = []
                for p in parts:
                    if p in ("<image>", "<video>"):
                        ids.append(self.vocab[p])
                    else:
                        ids.extend(self._id(w) for w in p.split())
                if max_length:
                    ids = ids[:max_length]
                out.append(ids)
            return {"input_ids": out}

    return Mini()
