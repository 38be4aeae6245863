"""OpenAI-compatible serving endpoint: real HTTP round-trips against a
tiny adapter (mantis_tpu/serving/server.py)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax

from mantis_tpu.benchmark.adapters.chat_models import ARCH_CHAT_CLASSES
from mantis_tpu.serving.server import make_server, messages_to_adapter
from mantis_tpu.train.archs import get_arch
from mantis_tpu.utils.debug_tokenizer import build_tokenizer_from_texts


def _tiny_adapter(arch="idefics3"):
    tok = build_tokenizer_from_texts(
        ["hello what is in this image USER ASSISTANT"])
    spec = get_arch(arch)
    cfg = spec.debug_config(tok)
    params = spec.init_params(cfg, jax.random.PRNGKey(0), np.float32)
    processor = spec.make_processor(tok, cfg)
    import jax.numpy as jnp

    return ARCH_CHAT_CLASSES[arch](cfg, params, processor,
                                   max_new_tokens=4,
                                   cache_dtype=jnp.float32)


@pytest.fixture(scope="module")
def server():
    srv = make_server(_tiny_adapter(), port=0, model_id="tiny-idefics3")
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_models_endpoint(server):
    with urllib.request.urlopen(server + "/v1/models") as r:
        data = json.loads(r.read())
    assert data["data"][0]["id"] == "tiny-idefics3"


def test_chat_completion_with_base64_image(server):
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, "PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    status, data = _post(server + "/v1/chat/completions", {
        "model": "tiny-idefics3",
        "max_tokens": 3,
        "messages": [{"role": "user", "content": [
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{b64}"}},
            {"type": "text", "text": "what is in this image ?"},
        ]}],
    })
    assert status == 200, data
    msg = data["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert isinstance(msg["content"], str)
    assert data["object"] == "chat.completion"


def test_chat_completion_plain_text(server):
    status, data = _post(server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello"}]})
    assert status == 200, data
    assert isinstance(data["choices"][0]["message"]["content"], str)


def test_bad_content_type_is_a_400_not_a_crash(server):
    status, data = _post(server + "/v1/chat/completions", {
        "messages": [{"role": "user",
                      "content": [{"type": "audio_url"}]}]})
    assert status == 400
    assert "unsupported" in data["error"]["message"]


def test_messages_to_adapter_mapping(tmp_path):
    img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    path = tmp_path / "i.png"
    img.save(path)
    out = messages_to_adapter([
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": str(path)}},
            {"type": "video_url",
             "video_url": {"url": "file:///tmp/clip.mp4"}},
            {"type": "text", "text": "describe"},
        ]},
    ])
    assert [m["type"] for m in out] == ["text", "image", "video", "text"]
    assert out[0]["content"] == "system: be brief"
    assert isinstance(out[1]["content"], Image.Image)
    assert out[2]["content"] == "/tmp/clip.mp4"


def test_local_file_paths_rejected_by_default(server):
    status, data = _post(server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": "/etc/hostname"}},
            {"type": "text", "text": "what is this"}]}]})
    assert status == 400
    assert "local file paths are disabled" in data["error"]["message"]


def test_mllava_alias_resolves():
    from mantis_tpu.benchmark.adapters import MLLM_Models

    # both spellings of the flagship adapter resolve (README uses
    # mllava:<dir>); construction is lazy so no checkpoint is needed
    assert callable(MLLM_Models("mllava:/nonexistent"))
    assert callable(MLLM_Models("mantis-tpu:/nonexistent"))
