"""Continuous-batching engine (serving/engine.py): per-row cache
math, token identity vs batch-1 greedy, admit/retire scheduling, and
the lock-free HTTP path."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mantis_tpu.models import llama
from mantis_tpu.models.configs import LlamaConfig
from mantis_tpu.models.llama import KVCache


def _tiny_lm_cfg(vocab=64):
    return LlamaConfig(
        vocab_size=vocab, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rope_theta=10000.0)


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8])
def test_per_row_lengths_match_batch1_decode(cache_dtype):
    """Decoding a 2-slot cache whose rows sit at DIFFERENT lengths must
    emit exactly what each row emits alone in a batch-1 cache."""
    cfg = _tiny_lm_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    prompts = [rng.randint(2, 60, size=n).tolist() for n in (7, 13)]

    def prefill_b1(ids, max_len):
        cache = KVCache.create(cfg, 1, max_len, dtype=cache_dtype)
        x = jnp.asarray([ids])
        logits, cache = llama.forward(
            params, cfg, input_ids=x,
            positions=jnp.arange(len(ids))[None, :],
            segment_ids=jnp.ones((1, len(ids)), jnp.int32),
            kv_cache=cache)
        return int(jnp.argmax(logits[0, -1])), cache

    def decode_b1(tok, cache, n):
        out = []
        for _ in range(n):
            logits, cache = llama.forward(
                params, cfg, input_ids=jnp.asarray([[tok]]),
                positions=jnp.asarray(cache.length).reshape(1, 1),
                segment_ids=jnp.ones((1, 1), jnp.int32), kv_cache=cache)
            tok = int(jnp.argmax(logits[0, -1]))
            out.append(tok)
        return out

    M = 32
    refs, b1 = [], []
    for ids in prompts:
        t0, c = prefill_b1(ids, M)
        b1.append((t0, c))
        refs.append([t0] + decode_b1(t0, c, 5))

    # assemble the 2-slot batched cache from the two batch-1 caches
    big = KVCache.create(cfg, 2, M, dtype=cache_dtype)
    k = jnp.concatenate([c.k for _, c in b1], axis=1)
    v = jnp.concatenate([c.v for _, c in b1], axis=1)
    seg = jnp.concatenate([c.seg for _, c in b1], axis=0)
    kw = {}
    if cache_dtype == jnp.int8:
        kw = dict(
            k_scale=jnp.concatenate([c.k_scale for _, c in b1], axis=1),
            v_scale=jnp.concatenate([c.v_scale for _, c in b1], axis=1))
    big = KVCache(k=k, v=v, seg=seg,
                  length=jnp.asarray([len(p) for p in prompts],
                                     jnp.int32), **kw)

    toks = jnp.asarray([b1[0][0], b1[1][0]], jnp.int32)
    got = [[int(toks[0])], [int(toks[1])]]
    for _ in range(5):
        logits, big = llama.forward(
            params, cfg, input_ids=toks[:, None],
            positions=big.length[:, None],
            segment_ids=jnp.ones((2, 1), jnp.int32), kv_cache=big)
        toks = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        got[0].append(int(toks[0]))
        got[1].append(int(toks[1]))
    assert got == refs


def _tiny_mantis(cache_dtype=jnp.float32):
    from mantis_tpu.models.configs import LlavaConfig, VisionConfig
    from mantis_tpu.models.mllava import model as mllava_model
    from mantis_tpu.models.mllava.chat import MantisLlava
    from mantis_tpu.models.mllava.processor import (
        ImageProcessorConfig, MantisImageProcessor, MLlavaProcessor)
    from mantis_tpu.utils.debug_tokenizer import build_tokenizer_from_texts

    tok = build_tokenizer_from_texts(
        ["what is in this image tell me more about it the answer is "
         "USER ASSISTANT hello there one two three four five"])
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


def _img(seed=0):
    from PIL import Image

    return Image.fromarray(
        np.random.RandomState(seed).randint(0, 255, (28, 28, 3),
                                            np.uint8))


PROMPTS = [
    ("what is in this <image> ?", [0]),
    ("tell me more about it", None),
    ("hello there one two", None),
    ("the answer is <image> and <image>", [1, 2]),
    ("one two three four five", None),
]


@pytest.mark.slow
def test_engine_token_identity_and_scheduling():
    """5 concurrent requests through a 2-slot engine: every reply must
    equal the serial adapter's batch-1 greedy output, and the engine
    must recycle slots (5 requests > 2 slots)."""
    from mantis_tpu.benchmark.adapters import MantisTPUAdapter
    from mantis_tpu.serving.engine import EngineAdapter

    model = _tiny_mantis()
    serial = MantisTPUAdapter("", max_new_tokens=6, model=model)
    eng = EngineAdapter(model, max_new_tokens=6, max_slots=2,
                        slot_ctx=128, chunk_tokens=3,
                        prefill_buckets=(32, 64))

    def msgs(text, seeds):
        out = []
        for part in text.split("<image>"):
            out.append({"type": "text", "content": part})
            if seeds:
                out.append({"type": "image",
                            "content": _img(seeds.pop(0))})
        return [m for m in out if m.get("content") != ""]

    expected = [serial(msgs(t, list(s) if s else None))
                for t, s in PROMPTS]

    results = [None] * len(PROMPTS)
    errs = []

    def worker(i):
        t, s = PROMPTS[i]
        try:
            results[i] = eng(msgs(t, list(s) if s else None))
        except Exception as e:  # surfaced below
            errs.append((i, e))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(PROMPTS))]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errs, errs
    assert results == expected
    s = eng.engine.stats()
    assert s["requests"] == len(PROMPTS)
    assert s["prefills"] == len(PROMPTS)
    assert s["tokens_out"] > 0 and s["decode_steps"] > 0
    eng.engine.shutdown()


def test_admission_bounded_per_chunk():
    """With live streams co-resident, a burst of arrivals admits at
    most max_admits_per_chunk prefills before the next decode chunk
    (head-of-line bound); with no live streams it admits freely."""
    from mantis_tpu.serving.engine import (
        ContinuousBatchingEngine, _Request, _Slot)

    model = _tiny_mantis()
    eng = ContinuousBatchingEngine(model, max_slots=4, slot_ctx=64,
                                   prefill_buckets=(32,),
                                   max_admits_per_chunk=1)
    # park the scheduler thread so _admit can be driven synchronously
    eng._stop = True
    eng._wake.set()
    eng._thread.join(timeout=30)

    admitted = []

    def fake_admit_one(req, i):
        admitted.append(i)
        eng.slots[i] = _Slot(req)

    eng._admit_one = fake_admit_one
    for _ in range(3):
        eng.pending.put(_Request([1, 2, 3], None, 4))

    # one live stream -> at most 1 admission this round
    eng.slots[0] = _Slot(_Request([1], None, 4))
    eng._admit()
    assert admitted == [1]
    # still-live streams -> again only one more
    eng._admit()
    assert admitted == [1, 2]
    # no live streams -> the rest admit freely
    eng.slots = [None] * eng.max_slots
    eng._admit()
    assert admitted == [1, 2, 0]


def test_engine_rejects_oversized_prompt():
    from mantis_tpu.serving.engine import ContinuousBatchingEngine

    model = _tiny_mantis()
    eng = ContinuousBatchingEngine(model, max_slots=2, slot_ctx=64,
                                   prefill_buckets=(32,))
    with pytest.raises(ValueError, match="slot_ctx"):
        eng.submit_ids(list(range(60)), None, max_new=16)
    with pytest.raises(ValueError, match="bucket"):
        eng.submit_ids(list(range(40)), None, max_new=8)
    eng.shutdown()


@pytest.mark.slow
def test_server_concurrent_requests_via_engine():
    """The lock-free HTTP path: concurrent clients against the engine
    adapter produce the same replies as the serial adapter."""
    from mantis_tpu.benchmark.adapters import MantisTPUAdapter
    from mantis_tpu.serving.engine import EngineAdapter
    from mantis_tpu.serving.server import make_server

    model = _tiny_mantis()
    serial = MantisTPUAdapter("", max_new_tokens=5, model=model)
    eng = EngineAdapter(model, max_new_tokens=5, max_slots=2,
                        slot_ctx=128, chunk_tokens=4,
                        prefill_buckets=(32, 64))
    srv = make_server(eng, port=0, model_id="tiny-engine")
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    texts = ["hello there", "one two three", "tell me more about it",
             "the answer is"]
    expected = [serial([{"type": "text", "content": t}]) for t in texts]

    results = [None] * len(texts)

    def client(i):
        req = urllib.request.Request(
            url + "/v1/chat/completions",
            data=json.dumps({
                "messages": [{"role": "user", "content": texts[i]}],
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            results[i] = json.loads(
                r.read())["choices"][0]["message"]["content"]

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(texts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert results == expected
    with urllib.request.urlopen(url + "/v1/metrics") as r:
        m = json.loads(r.read())
    assert m["mode"] == "continuous_batching"
    assert m["requests"] == len(texts)
    assert m["tokens_out"] > 0
    srv.shutdown()
    eng.engine.shutdown()


def test_sample_rows_unit():
    """Per-row sampler: temp=0 rows are exact argmax; top_p below the
    max prob collapses to argmax for any temperature; top_p=1 samples
    from the full support deterministically in the key."""
    from mantis_tpu.serving.engine import _sample_rows

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 16).astype(np.float32) * 3)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4, dtype=jnp.uint32))
    greedy = np.asarray(jnp.argmax(logits, -1))

    # temp=0 everywhere -> argmax regardless of key
    out = np.asarray(_sample_rows(
        keys, logits, jnp.zeros(4), jnp.ones(4)))
    assert (out == greedy).all()

    # tiny top_p keeps only the top token even at high temperature
    out = np.asarray(_sample_rows(
        keys, logits, jnp.full(4, 5.0), jnp.full(4, 1e-6)))
    assert (out == greedy).all()

    # mixed rows: greedy rows unaffected by sampling co-residents
    temps = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    out = np.asarray(_sample_rows(keys, logits, temps, jnp.ones(4)))
    assert out[0] == greedy[0] and out[2] == greedy[2]
    assert ((out >= 0) & (out < 16)).all()

    # deterministic in the key
    out2 = np.asarray(_sample_rows(keys, logits, temps, jnp.ones(4)))
    assert (out == out2).all()

    # top_p=1.0 must not index past the vocab (cum<1.0 float edge)
    flat = jnp.zeros((2, 16))
    out = np.asarray(_sample_rows(
        keys[:2], flat, jnp.ones(2), jnp.ones(2)))
    assert ((out >= 0) & (out < 16)).all()


@pytest.mark.slow
def test_engine_sampling_determinism_and_greedy_isolation():
    """A sampled request (seed fixed) and a greedy request co-resident
    in one engine: the greedy reply must stay bit-identical to the
    serial greedy output, and re-running the sampled request alone
    with the same seed must reproduce its tokens exactly."""
    from mantis_tpu.benchmark.adapters import MantisTPUAdapter
    from mantis_tpu.serving.engine import EngineAdapter

    model = _tiny_mantis()
    serial = MantisTPUAdapter("", max_new_tokens=8, model=model)
    eng = EngineAdapter(model, max_new_tokens=8, max_slots=2,
                        slot_ctx=128, chunk_tokens=3,
                        prefill_buckets=(32, 64))

    greedy_msgs = [{"type": "text", "content": "tell me more about it"}]
    samp_msgs = [{"type": "text", "content": "hello there one two"}]
    expected_greedy = serial(greedy_msgs)

    results = {}

    def run(name, msgs, **kw):
        results[name] = eng(msgs, **kw)

    threads = [
        threading.Thread(target=run, args=("greedy", greedy_msgs)),
        threading.Thread(target=run, args=("samp", samp_msgs),
                         kwargs=dict(temperature=0.9, top_p=0.95,
                                     seed=7)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert results["greedy"] == expected_greedy

    # same seed alone -> identical sampled tokens (determinism is in
    # (seed, prompt), not in co-residency or chunk phase)
    again = eng(samp_msgs, temperature=0.9, top_p=0.95, seed=7)
    assert again == results["samp"]
    # different seed -> allowed to differ (sanity that seed is wired);
    # not asserted unequal (a 2-layer toy model may tie)
    eng(samp_msgs, temperature=0.9, top_p=0.95, seed=8)
    eng.engine.shutdown()


@pytest.mark.slow
def test_engine_streaming_matches_sync():
    """adapter.stream deltas concatenate to the sync reply (greedy),
    and the SSE HTTP path delivers the same text chunk-by-chunk."""
    from mantis_tpu.serving.engine import EngineAdapter
    from mantis_tpu.serving.server import make_server

    model = _tiny_mantis()
    eng = EngineAdapter(model, max_new_tokens=6, max_slots=2,
                        slot_ctx=128, chunk_tokens=3,
                        prefill_buckets=(32, 64))
    msgs = [{"type": "text", "content": "what is in this"}]
    expected = eng(msgs)
    streamed = "".join(eng.stream(msgs)).strip()
    assert streamed == expected

    srv = make_server(eng, port=0, model_id="tiny-engine")
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    req = urllib.request.Request(
        url + "/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": "what is in this"}],
            "stream": True,
        }).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        for line in r:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                events.append(None)
                break
            events.append(json.loads(payload))
    assert events[-1] is None
    assert events[0]["choices"][0]["delta"] == {"role": "assistant"}
    # the final chunk reports the REAL finish_reason ("length" when
    # the budget ran out — the usual case on random weights)
    assert events[-2]["choices"][0]["finish_reason"] in ("stop",
                                                         "length")
    text = "".join(
        e["choices"][0]["delta"].get("content", "")
        for e in events[:-1] if e is not None).strip()
    assert text == expected
    srv.shutdown()
    eng.engine.shutdown()


def test_prefix_match_clamps_and_lru():
    """Host-side prefix planner: token lcp, image-run boundary clamp,
    image-byte mismatch clamp, LRU eviction."""
    from mantis_tpu.serving.engine import ContinuousBatchingEngine

    model = _tiny_mantis()
    eng = ContinuousBatchingEngine(model, max_slots=2, slot_ctx=64,
                                   prefill_buckets=(32,),
                                   max_cached_prefixes=2,
                                   min_prefix_tokens=4)
    eng._stop = True
    eng._wake.set()
    eng._thread.join(timeout=30)

    itok = model.cfg.image_token_index
    tpi = model.cfg.num_image_tokens
    base = [5, 6, 7, 8] + [itok] * tpi + [9, 10, 11]

    eng._store_prefix(base, ["imgA"], cache="c1", bucket=32)

    # pure token match, no images in the shared region
    m, e = eng._match_prefix([5, 6, 7, 8, 20, 21, 22, 23], [])
    assert (m, e["cache"]) == (4, "c1")

    # identical tokens THROUGH the image + same image bytes
    m, e = eng._match_prefix(base[:-1] + [40], ["imgA"])
    assert m == len(base) - 1 and e["cache"] == "c1"

    # same tokens, DIFFERENT image bytes -> clamp to before the image
    m, e = eng._match_prefix(base[:-1] + [40], ["imgB"])
    assert (m, e["cache"]) == (4, "c1")

    # a match may never split an image-token run
    m, e = eng._match_prefix(base[:4 + tpi - 1] + [50, 51, 52, 53],
                             ["imgA"])
    assert m == 4

    # below min_prefix_tokens -> no reuse
    m, e = eng._match_prefix([5, 6, 7, 99, 98, 97], [])
    assert (m, e) == (0, None)

    # LRU: cap 2, third insert evicts the oldest
    eng._store_prefix([1, 2, 3], [], cache="c2", bucket=32)
    eng._store_prefix([4, 5, 6], [], cache="c3", bucket=32)
    assert [e["cache"] for e in eng.prefix_store] == ["c3", "c2"]
    # re-store moves to front instead of duplicating
    eng._store_prefix([1, 2, 3], [], cache="c2b", bucket=32)
    assert [e["cache"] for e in eng.prefix_store] == ["c2b", "c3"]


@pytest.mark.slow
def test_prefix_reuse_token_identity():
    """Requests sharing a long prefix: the second prefills only the
    suffix from the stored KV and must emit the same tokens as an
    engine with the cache disabled (f32 tiny model)."""
    from mantis_tpu.serving.engine import ContinuousBatchingEngine

    model = _tiny_mantis()
    rng = np.random.RandomState(0)
    prefix = rng.randint(5, 60, size=40).tolist()
    sufa = rng.randint(5, 60, size=9).tolist()
    sufb = rng.randint(5, 60, size=11).tolist()

    def make(cached):
        return ContinuousBatchingEngine(
            model, max_slots=2, slot_ctx=128,
            prefill_buckets=(16, 64), max_cached_prefixes=cached,
            min_prefix_tokens=16)

    plain = make(0)
    ref_a = plain.generate_sync(prefix + sufa, None, 6)
    ref_b = plain.generate_sync(prefix + sufb, None, 6)
    plain.shutdown()

    eng = make(2)
    got_a = eng.generate_sync(prefix + sufa, None, 6)
    got_b = eng.generate_sync(prefix + sufb, None, 6)
    s = eng.stats()
    assert got_a == ref_a and got_b == ref_b
    assert s["prefix_hits"] == 1          # second request hit
    assert s["prefix_tokens_reused"] == len(prefix)
    # third request: longer lcp with the stored full prompt of req2
    # (the reused prefix shrinks to fit the suffix chunk in-bucket)
    got_b2 = eng.generate_sync(prefix + sufb + [7], None, 6)
    plain2 = make(0)
    assert got_b2 == plain2.generate_sync(prefix + sufb + [7], None, 6)
    plain2.shutdown()
    assert eng.stats()["prefix_hits"] == 2
    eng.shutdown()


@pytest.mark.slow
def test_prefix_reuse_with_images():
    """A multimodal shared prefix (image inside it) reuses KV only
    when the image BYTES match; a different image clamps reuse to the
    tokens before it.  Replies stay identical to the no-cache engine
    in both cases, including an image in the suffix."""
    from mantis_tpu.serving.engine import ContinuousBatchingEngine

    model = _tiny_mantis()
    itok = model.cfg.image_token_index
    tpi = model.cfg.num_image_tokens
    rng = np.random.RandomState(1)
    head = rng.randint(5, 60, size=20).tolist()
    tail = rng.randint(5, 60, size=6).tolist()
    ids = head + [itok] * tpi + tail          # image inside the prefix
    img1 = rng.randn(1, 3, 28, 28).astype(np.float32)
    img2 = rng.randn(1, 3, 28, 28).astype(np.float32)
    sufa = rng.randint(5, 60, size=5).tolist()
    # suffix with its own image
    suf_img = rng.randint(5, 60, size=3).tolist() + [itok] * tpi
    img3 = rng.randn(1, 3, 28, 28).astype(np.float32)

    def make(cached):
        return ContinuousBatchingEngine(
            model, max_slots=2, slot_ctx=128,
            prefill_buckets=(16, 64), max_cached_prefixes=cached,
            min_prefix_tokens=8)

    plain = make(0)
    ref_a1 = plain.generate_sync(ids + sufa, img1, 5)
    ref_a2 = plain.generate_sync(ids + sufa, img2, 5)
    ref_im = plain.generate_sync(ids + suf_img,
                                 np.concatenate([img1, img3]), 5)
    plain.shutdown()

    eng = make(4)
    assert eng.generate_sync(ids, img1, 4) is not None  # seeds store
    # same image -> reuse through the image tokens
    assert eng.generate_sync(ids + sufa, img1, 5) == ref_a1
    s = eng.stats()
    assert s["prefix_hits"] == 1
    assert s["prefix_tokens_reused"] == len(ids)
    # different image -> reuse clamped to before the image run
    assert eng.generate_sync(ids + sufa, img2, 5) == ref_a2
    s = eng.stats()
    assert s["prefix_hits"] == 2
    assert s["prefix_tokens_reused"] == len(ids) + len(head)
    # image in the SUFFIX: spliced into the suffix prefill correctly
    assert eng.generate_sync(ids + suf_img,
                             np.concatenate([img1, img3]), 5) == ref_im
    assert eng.stats()["prefix_hits"] == 3
    eng.shutdown()


@pytest.mark.slow
def test_engine_with_tp_sharded_params():
    """Multi-chip serving: the engine's jitted programs (prefill,
    slot-insert, decode chunk) run unchanged with megatron-sharded
    params on a (data=2, tensor=4) mesh — GSPMD propagates the
    shardings through the shared KV cache — and emit exactly the
    single-device replies."""
    from mantis_tpu.parallel.mesh import create_mesh
    from mantis_tpu.parallel.sharding import shard_params
    from mantis_tpu.serving.engine import EngineAdapter

    model = _tiny_mantis()
    prompts = [
        ("what is in this <image> ?", [0]),
        ("tell me more about it", None),
        ("the answer is <image> and", [1]),
    ]

    def msgs(text, seeds):
        out = []
        for part in text.split("<image>"):
            out.append({"type": "text", "content": part})
            if seeds:
                out.append({"type": "image",
                            "content": _img(seeds.pop(0))})
        return [m for m in out if m.get("content") != ""]

    eng = EngineAdapter(model, max_new_tokens=6, max_slots=2,
                        slot_ctx=128, chunk_tokens=3,
                        prefill_buckets=(32, 64))
    expected = [eng(msgs(t, list(s) if s else None))
                for t, s in prompts]
    eng.engine.shutdown()

    mesh = create_mesh(data=2, tensor=4)
    model.params = shard_params(model.params, mesh)
    eng_tp = EngineAdapter(model, max_new_tokens=6, max_slots=2,
                           slot_ctx=128, chunk_tokens=3,
                           prefill_buckets=(32, 64))
    got = [eng_tp(msgs(t, list(s) if s else None))
           for t, s in prompts]
    assert got == expected
    eng_tp.engine.shutdown()


# ---------------------------------------------------------------------------
# Speculative decoding inside the engine (round 3)
# ---------------------------------------------------------------------------

def test_spec_engine_token_identity_under_load():
    """Continuous batching composed with speculative verify-steps
    (spec_tokens>0): every reply under concurrent load must be exactly
    the non-speculative engine's greedy output (f32 CPU — greedy
    verification makes acceptance invisible in the tokens)."""
    from mantis_tpu.serving.engine import EngineAdapter

    model = _tiny_mantis()

    def msgs(text, seeds):
        out = []
        for part in text.split("<image>"):
            out.append({"type": "text", "content": part})
            if seeds:
                out.append({"type": "image",
                            "content": _img(seeds.pop(0))})
        return [m for m in out if m.get("content") != ""]

    plain = EngineAdapter(model, max_new_tokens=12, max_slots=2,
                          slot_ctx=128, chunk_tokens=3,
                          prefill_buckets=(32, 64))
    expected = [plain(msgs(t, list(s) if s else None))
                for t, s in PROMPTS]
    plain.engine.shutdown()

    eng = EngineAdapter(model, max_new_tokens=12, max_slots=2,
                        slot_ctx=128, chunk_tokens=3,
                        prefill_buckets=(32, 64), spec_tokens=3,
                        spec_ngram=1)
    results = [None] * len(PROMPTS)
    errs = []

    def worker(i):
        t, s = PROMPTS[i]
        try:
            results[i] = eng(msgs(t, list(s) if s else None))
        except Exception as e:
            errs.append((i, e))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(PROMPTS))]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errs, errs
    assert results == expected
    s = eng.engine.stats()
    assert s["requests"] == len(PROMPTS)
    # the accept counter is wired (>0 requires n-gram recurrence in the
    # toy generations, asserted separately below)
    assert s["spec_extra_tokens"] >= 0
    eng.engine.shutdown()


def test_spec_engine_accepts_drafts_on_repetitive_stream():
    """A generation that repeats n-grams must actually accept drafts:
    spec_extra_tokens > 0 and fewer decode chunks than the plain engine
    for the same tokens."""
    from mantis_tpu.serving.engine import ContinuousBatchingEngine

    model = _tiny_mantis()
    tok = model.processor.tokenizer
    # a long repeated block primes prompt-lookup: the model's greedy
    # continuation of a repeating context tends to repeat, and with
    # ngram=1 any recurrence drafts
    ids = tok("one two three four five one two three four five one two "
              "three four five one two")["input_ids"]
    eng = ContinuousBatchingEngine(model, max_slots=2, slot_ctx=256,
                                   chunk_tokens=3,
                                   prefill_buckets=(64,),
                                   spec_tokens=3, spec_ngram=1)
    out_spec = eng.generate_sync(ids, None, 24)
    stats = eng.stats()
    eng.shutdown()

    plain = ContinuousBatchingEngine(model, max_slots=2, slot_ctx=256,
                                     chunk_tokens=3,
                                     prefill_buckets=(64,))
    out_plain = plain.generate_sync(ids, None, 24)
    plain.shutdown()
    assert out_spec == out_plain
    assert stats["spec_extra_tokens"] > 0, stats


def test_spec_engine_sampling_determinism_and_greedy_isolation():
    """Sampling composes with the speculative engine: sampled rows
    draft nothing (one key split per emitted token — the same cadence
    as the plain engine, so the same (seed, prompt) tokens), and a
    greedy co-resident still accepts drafts and matches the plain
    engine's greedy reply."""
    from mantis_tpu.serving.engine import EngineAdapter

    model = _tiny_mantis()
    greedy_msgs = [{"type": "text", "content": "tell me more about it"}]
    samp_msgs = [{"type": "text", "content": "hello there one two"}]

    plain = EngineAdapter(model, max_new_tokens=8, max_slots=2,
                          slot_ctx=128, chunk_tokens=3,
                          prefill_buckets=(32, 64))
    expected_greedy = plain(greedy_msgs)
    expected_samp = plain(samp_msgs, temperature=0.9, top_p=0.95,
                          seed=7)
    plain.engine.shutdown()

    eng = EngineAdapter(model, max_new_tokens=8, max_slots=2,
                        slot_ctx=128, chunk_tokens=3,
                        prefill_buckets=(32, 64), spec_tokens=3,
                        spec_ngram=1)
    results = {}

    def run(name, msgs, **kw):
        results[name] = eng(msgs, **kw)

    threads = [
        threading.Thread(target=run, args=("greedy", greedy_msgs)),
        threading.Thread(target=run, args=("samp", samp_msgs),
                         kwargs=dict(temperature=0.9, top_p=0.95,
                                     seed=7)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert results["greedy"] == expected_greedy
    assert results["samp"] == expected_samp
    eng.engine.shutdown()


def test_spec_engine_budget_and_headroom():
    """max_new is respected exactly through multi-token emissions, and
    the submit guard accounts for the speculative KV headroom."""
    from mantis_tpu.serving.engine import ContinuousBatchingEngine

    model = _tiny_mantis()
    tok = model.processor.tokenizer
    ids = tok("one two three four five one two three")["input_ids"]
    eng = ContinuousBatchingEngine(model, max_slots=2, slot_ctx=64,
                                   chunk_tokens=3,
                                   prefill_buckets=(32,),
                                   spec_tokens=3, spec_ngram=1)
    out = eng.generate_sync(ids, None, 2)
    assert len(out) <= 2
    with pytest.raises(ValueError, match="exceeds"):
        # 32-token prompt + 29 max_new + 1 + 3 spec headroom > 64
        eng.submit_ids(list(range(3, 35)), None, 29)
    eng.shutdown()


# ---------------------------------------------------------------------------
# Chunked prefill (round 3)
# ---------------------------------------------------------------------------

def test_plan_pieces_never_splits_image_runs():
    from mantis_tpu.serving.engine import _plan_pieces

    # no images: plain chunking
    assert _plan_pieces(10, [], 4) == [(0, 4), (4, 8), (8, 10)]
    # a run straddling the cut moves the cut to the run start
    assert _plan_pieces(12, [(3, 7)], 4) == [(0, 3), (3, 7), (7, 11),
                                             (11, 12)]
    # a run longer than the chunk becomes its own piece
    assert _plan_pieces(14, [(2, 11)], 4) == [(0, 2), (2, 11), (11, 14)]
    # run exactly at a boundary is untouched
    assert _plan_pieces(8, [(4, 8)], 4) == [(0, 4), (4, 8)]
    # pieces tile [0, n) exactly
    for n, runs, c in ((37, [(5, 14), (20, 29)], 8), (9, [(0, 9)], 4)):
        pieces = _plan_pieces(n, runs, c)
        assert pieces[0][0] == 0 and pieces[-1][1] == n
        assert all(a[1] == b[0] for a, b in zip(pieces, pieces[1:]))
        for (p, q) in pieces:
            assert q > p
            for (s, e) in runs:
                assert not (p < s < q < e) and not (s < p < e < q)


def test_chunked_prefill_token_identity():
    """Chunked admission (prefill_chunk smaller than the prompts) must
    emit exactly the whole-prompt engine's replies — text-only AND
    multi-image prompts whose image spans sit near piece boundaries."""
    from mantis_tpu.serving.engine import EngineAdapter

    model = _tiny_mantis()

    def msgs(text, seeds):
        out = []
        for part in text.split("<image>"):
            out.append({"type": "text", "content": part})
            if seeds:
                out.append({"type": "image",
                            "content": _img(seeds.pop(0))})
        return [m for m in out if m.get("content") != ""]

    prompts = [
        ("what is in this <image> ?", [0]),
        ("tell me more about it hello there one two three four five "
         "what is in this the answer is", None),
        ("the answer is <image> and <image> tell me more", [1, 2]),
    ]
    plain = EngineAdapter(model, max_new_tokens=8, max_slots=2,
                          slot_ctx=128, chunk_tokens=3,
                          prefill_buckets=(32, 64))
    expected = [plain(msgs(t, list(s) if s else None))
                for t, s in prompts]
    plain.engine.shutdown()

    eng = EngineAdapter(model, max_new_tokens=8, max_slots=2,
                        slot_ctx=128, chunk_tokens=3,
                        prefill_buckets=(32, 64), prefill_chunk=8)
    got = [eng(msgs(t, list(s) if s else None)) for t, s in prompts]
    stats = eng.engine.stats()
    eng.engine.shutdown()
    assert got == expected
    # every prompt here exceeds 8 tokens, so each admitted in pieces
    assert stats["prefill_pieces"] > stats["prefills"], stats


def test_chunked_prefill_interleaves_decode_chunks():
    """A live stream keeps decoding while a long prompt admits in
    pieces: decode chunks run between pieces (counter-visible)."""
    from mantis_tpu.serving.engine import ContinuousBatchingEngine

    model = _tiny_mantis()
    tok = model.processor.tokenizer
    short = tok("hello there")["input_ids"]
    long = tok("one two three four five what is in this tell me more "
               "about it the answer is one two three four five")["input_ids"]
    eng = ContinuousBatchingEngine(model, max_slots=2, slot_ctx=128,
                                   chunk_tokens=2,
                                   prefill_buckets=(32, 64),
                                   prefill_chunk=8)
    r1 = eng.submit_ids(short, None, 24)
    while not r1.tokens:          # wait until the stream is decoding
        import time as _t
        _t.sleep(0.01)
    chunks_before = eng.counters["decode_chunks"]
    r2 = eng.submit_ids(long, None, 4)
    r2.done.wait(120)
    pieces = eng.counters["prefill_pieces"]
    chunks_during = eng.counters["decode_chunks"] - chunks_before
    r1.done.wait(120)
    eng.shutdown()
    assert pieces >= 3            # long prompt admitted in pieces
    # at least one decode chunk ran between pieces (the stall bound)
    assert chunks_during >= pieces - 1, (pieces, chunks_during)
    assert r2.error is None and len(r2.tokens) <= 4


# ---------------------------------------------------------------------------
# Stop sequences (round 3)
# ---------------------------------------------------------------------------

def test_engine_adapter_stop_sequences():
    """stop= truncates before the first hit, cancels the slot (freeing
    it early), and streaming deltas concatenate to the same text."""
    from mantis_tpu.serving.engine import EngineAdapter

    model = _tiny_mantis()
    msgs = [{"type": "text", "content": "tell me more about it"}]
    eng = EngineAdapter(model, max_new_tokens=16, max_slots=2,
                        slot_ctx=128, chunk_tokens=2,
                        prefill_buckets=(32, 64))
    full = eng(msgs)
    words = full.split()
    assert len(words) >= 2, full
    stop_word = words[1]
    expected = full[:full.find(stop_word)].strip()

    got = eng(msgs, stop=[stop_word])
    assert got == expected, (got, expected, full)
    # string form too
    assert eng(msgs, stop=stop_word) == expected

    streamed = "".join(eng.stream(msgs, stop=[stop_word])).strip()
    assert streamed == expected

    # a stop that never occurs leaves the reply untouched
    assert eng(msgs, stop=["@@nohit@@"]) == full
    streamed_all = "".join(eng.stream(msgs, stop=["@@nohit@@"])).strip()
    assert streamed_all == full

    # cancelled slots are freed (no stuck occupancy)
    import time as _t
    deadline = _t.time() + 10
    while _t.time() < deadline and eng.engine.stats()["occupancy"]:
        _t.sleep(0.05)
    assert eng.engine.stats()["occupancy"] == 0
    eng.engine.shutdown()


def test_server_stop_postprocess_for_serial_adapters():
    """Serial adapters get protocol-correct stop handling by server-
    side truncation; invalid stop types 400 as ValueError."""
    from mantis_tpu.serving.server import ChatAPIServer

    class Dummy:
        def __call__(self, msgs):
            return "alpha beta gamma delta"

    srv = ChatAPIServer(Dummy())
    body = {"messages": [{"role": "user", "content": "hi"}],
            "stop": ["gamma", "beta"]}
    out = srv.handle_chat(body)
    assert out["choices"][0]["message"]["content"] == "alpha"

    out = srv.handle_chat({**body, "stop": "delta"})
    assert out["choices"][0]["message"]["content"] == "alpha beta gamma"

    with pytest.raises(ValueError):
        srv.handle_chat({**body, "stop": [1, 2]})


# ---------------------------------------------------------------------------
# batched admissions
# ---------------------------------------------------------------------------

def _stopped_engine(model, **kw):
    """Engine with its scheduler thread stopped so tests can drive
    _admit/_decode_once deterministically (same sequence as _loop)."""
    from mantis_tpu.serving.engine import ContinuousBatchingEngine

    eng = ContinuousBatchingEngine(model, **kw)
    eng._stop = True
    eng._wake.set()
    eng._thread.join()
    eng._stop = False
    return eng


def _drive(eng):
    """Run the scheduler inline until every request retires."""
    eng._admit()
    while any(s is not None for s in eng.slots):
        eng._decode_once()
        eng._admit()


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8])
def test_batched_admission_identity(cache_dtype):
    """A burst of text-only requests (prefix cache off) admits through
    ONE batched prefill + insert, and every reply is exactly the
    serial one-at-a-time engine's (CPU: bitwise; int8 covers the
    batched insert's per-row scale scatter)."""
    model = _tiny_mantis(cache_dtype)
    rng = np.random.RandomState(3)
    prompts = [rng.randint(2, 40, size=n).tolist()
               for n in (5, 9, 7, 12)]
    kw = dict(max_slots=4, slot_ctx=64, chunk_tokens=3,
              prefill_buckets=(16, 32), max_cached_prefixes=0)

    serial = _stopped_engine(model, **kw)
    expected = []
    for p in prompts:
        req = serial.submit_ids(p, None, 6)
        _drive(serial)
        expected.append(req.tokens)
    assert serial.counters["prefill_batches"] == 0  # singles path
    assert serial.counters["prefills"] == 4

    eng = _stopped_engine(model, **kw)
    reqs = [eng.submit_ids(p, None, 6) for p in prompts]
    _drive(eng)
    assert [r.tokens for r in reqs] == expected
    # all four prompts fit the 16-bucket -> one batch of 4
    assert eng.counters["prefill_batches"] == 1
    assert eng.counters["prefills"] == 4


def test_batched_admission_buckets_images_and_prefix_cache():
    """Bucket grouping: mixed lengths split into per-bucket batches;
    image requests and prefix-cache engines stay on the single path."""
    model = _tiny_mantis()
    rng = np.random.RandomState(5)
    short = [rng.randint(2, 40, size=n).tolist() for n in (4, 6)]
    long = [rng.randint(2, 40, size=n).tolist() for n in (20, 25)]
    kw = dict(max_slots=4, slot_ctx=64, chunk_tokens=3,
              prefill_buckets=(16, 32), max_cached_prefixes=0)
    eng = _stopped_engine(model, **kw)
    reqs = [eng.submit_ids(p, None, 4) for p in short + long]
    _drive(eng)
    assert eng.counters["prefill_batches"] == 2  # one per bucket
    assert all(len(r.tokens) >= 1 for r in reqs)

    # image request: single path (batched prefill is text-only)
    proc = model.processor
    enc = proc("USER: <image> hello ASSISTANT:",
               [_img(0)], truncation=True, max_length=None)
    ids = [int(t) for t in np.asarray(enc["input_ids"][0])]
    eng2 = _stopped_engine(model, **kw)
    r_img = eng2.submit_ids(ids, enc["pixel_values"], 4)
    r_txt = eng2.submit_ids(short[0], None, 4)
    _drive(eng2)
    assert eng2.counters["prefill_batches"] == 0
    assert len(r_img.tokens) >= 1 and r_txt.tokens == reqs[0].tokens

    # prefix cache on: batching disabled (scratches must be stored)
    eng3 = _stopped_engine(model, **{**kw, "max_cached_prefixes": 2})
    reqs3 = [eng3.submit_ids(p, None, 4) for p in short]
    _drive(eng3)
    assert eng3.counters["prefill_batches"] == 0
    assert [r.tokens for r in reqs3] == [r.tokens for r in reqs[:2]]


def test_batched_admission_sampling_determinism_and_greedy_isolation():
    """A batch mixing greedy and sampled rows: greedy rows equal the
    serial greedy reply exactly; sampled rows are deterministic in
    (seed, prompt) whether admitted batched or alone."""
    model = _tiny_mantis()
    rng = np.random.RandomState(7)
    p_greedy = rng.randint(2, 40, size=6).tolist()
    p_sample = rng.randint(2, 40, size=8).tolist()
    kw = dict(max_slots=4, slot_ctx=64, chunk_tokens=3,
              prefill_buckets=(16,), max_cached_prefixes=0)

    alone = _stopped_engine(model, **kw)
    rg = alone.submit_ids(p_greedy, None, 5)
    _drive(alone)
    rs = alone.submit_ids(p_sample, None, 5, temperature=0.9, seed=11)
    _drive(alone)

    eng = _stopped_engine(model, **kw)
    bg = eng.submit_ids(p_greedy, None, 5)
    bs = eng.submit_ids(p_sample, None, 5, temperature=0.9, seed=11)
    _drive(eng)
    assert eng.counters["prefill_batches"] == 1
    assert bg.tokens == rg.tokens
    assert bs.tokens == rs.tokens


def test_batched_admission_composes_with_speculative():
    """spec_tokens on: batch-admitted greedy streams still reply
    exactly like the serial plain engine (drafts verified per row)."""
    model = _tiny_mantis()
    rng = np.random.RandomState(9)
    prompts = [rng.randint(2, 40, size=n).tolist() for n in (6, 10)]
    base = dict(max_slots=2, slot_ctx=64, chunk_tokens=3,
                prefill_buckets=(16,), max_cached_prefixes=0)

    plain = _stopped_engine(model, **base)
    expected = []
    for p in prompts:
        req = plain.submit_ids(p, None, 8)
        _drive(plain)
        expected.append(req.tokens)

    spec = _stopped_engine(model, **{**base, "spec_tokens": 2})
    reqs = [spec.submit_ids(p, None, 8) for p in prompts]
    _drive(spec)
    assert spec.counters["prefill_batches"] == 1
    assert [r.tokens for r in reqs] == expected


def test_hold_admission_coalesces_live_scheduler_burst():
    """With the scheduler thread RUNNING, a hold_admission() block
    guarantees the whole burst admits in one pass (one batched prefill)
    — the deterministic warm-up primitive bench.py relies on.  Without
    the hold, the thread may drain 1..k requests per pass depending on
    wake-up timing (the round-3 serving-bench nondeterminism)."""
    from mantis_tpu.serving.engine import ContinuousBatchingEngine

    model = _tiny_mantis()
    rng = np.random.RandomState(13)
    prompts = [rng.randint(2, 40, size=n).tolist()
               for n in (5, 9, 7, 12)]
    kw = dict(max_slots=4, slot_ctx=64, chunk_tokens=3,
              prefill_buckets=(16,), max_cached_prefixes=0)

    serial = _stopped_engine(model, **kw)
    expected = []
    for p in prompts:
        req = serial.submit_ids(p, None, 6)
        _drive(serial)
        expected.append(req.tokens)

    eng = ContinuousBatchingEngine(model, **kw)
    try:
        for burst in range(3):  # repeatable across rounds, one engine
            # nothing admits while the hold is in force
            assert eng.counters["prefill_batches"] == burst
            with eng.hold_admission():
                reqs = [eng.submit_ids(p, None, 6) for p in prompts]
            for r in reqs:
                assert r.done.wait(60)
            assert [r.tokens for r in reqs] == expected
        # exactly one batched prefill per burst, every burst
        assert eng.counters["prefill_batches"] == 3
        assert eng.counters["prefills"] == 12
    finally:
        eng.shutdown()


def test_complete_usage_and_n_choices():
    """OpenAI protocol metadata: real usage counts + finish_reason from
    the engine, n>1 choices via the server handler."""
    from mantis_tpu.serving.engine import EngineAdapter
    from mantis_tpu.serving.server import ChatAPIServer

    model = _tiny_mantis()
    eng = EngineAdapter(model, max_new_tokens=6, max_slots=2,
                        slot_ctx=64, chunk_tokens=3,
                        prefill_buckets=(16, 32))
    msgs = [{"type": "text", "content": "hello there one two"}]
    out = eng.complete(msgs)
    assert out["prompt_tokens"] > 0
    assert 1 <= out["completion_tokens"] <= 6
    assert out["finish_reason"] in ("stop", "length")
    if out["completion_tokens"] == 6:
        assert out["finish_reason"] == "length"
    assert out["text"] == eng(msgs)

    srv = ChatAPIServer(eng)
    body = {"messages": [{"role": "user",
                          "content": "hello there one two"}],
            "max_tokens": 4, "n": 2}
    reply = srv.handle_chat(body)
    assert len(reply["choices"]) == 2
    assert [c["index"] for c in reply["choices"]] == [0, 1]
    # greedy n=2: identical texts, usage sums both completions
    assert (reply["choices"][0]["message"]["content"]
            == reply["choices"][1]["message"]["content"])
    u = reply["usage"]
    assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
    assert u["completion_tokens"] <= 8

    # stop-sequence path reports usage too (finish_reason "stop")
    full = eng(msgs, max_new_tokens=6)
    if len(full.split()) > 1:
        stop_word = full.split()[-1]
        out2 = eng.complete(msgs, max_new_tokens=6, stop=[stop_word])
        assert out2["finish_reason"] == "stop"
        assert out2["prompt_tokens"] == out["prompt_tokens"]

    eng.engine.shutdown()


def test_n_choices_requires_engine():
    from mantis_tpu.serving.server import ChatAPIServer

    class Dummy:
        def __call__(self, msgs):
            return "x"

    srv = ChatAPIServer(Dummy())
    body = {"messages": [{"role": "user", "content": "hi"}], "n": 2}
    with pytest.raises(ValueError):
        srv.handle_chat(body)


# ---------------------------------------------------------------------------
# generic engine (continuous batching beyond the flagship)
# ---------------------------------------------------------------------------

GENERIC_ARCHS = ["idefics2", "idefics3", "internvl", "mfuyu",
                 "videollava", "mllava_next", "qwen2_vl"]


def _arch_msgs(seed):
    return [
        [{"type": "text", "content": "Is this bright yes no ?"}],
        [{"type": "image", "content": _img(seed)},
         {"type": "text", "content": "Compare and same ?"}],
    ]


@pytest.mark.parametrize("arch", GENERIC_ARCHS)
def test_generic_engine_matches_serial_adapter(arch):
    """GenericEngineAdapter(chat) replies exactly like the serial
    GenericChat adapter on CPU f32, text and image prompts, serial and
    concurrent."""
    from tests.test_eval_adapters import make_adapter
    from mantis_tpu.serving.engine import GenericEngineAdapter

    chat = make_adapter(arch)
    msgs = _arch_msgs(3)
    expected = [chat(m) for m in msgs]

    eng = GenericEngineAdapter(chat, max_new_tokens=4, max_slots=2,
                               slot_ctx=256, chunk_tokens=2,
                               prefill_buckets=(64, 128, 256))
    serial_eng = [eng(m) for m in msgs]
    assert serial_eng == expected

    # concurrent burst: co-residency must not perturb any stream
    results = [None] * len(msgs)
    errs = []

    def worker(i):
        try:
            results[i] = eng(msgs[i])
        except Exception as e:   # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(msgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert results == expected
    eng.engine.shutdown()


def test_generic_engine_exclusions():
    from tests.test_eval_adapters import make_adapter
    from mantis_tpu.serving.engine import GenericEngineAdapter

    chat2 = make_adapter("idefics3")
    with pytest.raises(ValueError, match="prefix cache"):
        GenericEngineAdapter(chat2, max_cached_prefixes=2)
    with pytest.raises(ValueError, match="spec_tokens"):
        GenericEngineAdapter(chat2, spec_tokens=3)


def test_qwen2_engine_mrope_guards():
    """pos_offset / media_fn refuse the engine layers whose position
    tables don't carry them (spec verify, prefix cache, chunked
    prefill) instead of decoding with wrong RoPE positions."""
    from mantis_tpu.serving.engine import ContinuousBatchingEngine

    model = _tiny_mantis()
    eng = ContinuousBatchingEngine(
        model, max_slots=2, slot_ctx=64, chunk_tokens=2,
        prefill_buckets=(16, 32), spec_tokens=2,
        max_cached_prefixes=0)
    try:
        with pytest.raises(ValueError, match="pos_offset"):
            eng.submit_ids([1, 2, 3], None, 4, pos_offset=5)
        # media_fn implies an M-RoPE family even at delta 0: refuse it
        # on a spec engine too (round-3 advisor finding)
        with pytest.raises(ValueError, match="media_fn"):
            eng.submit_ids([1, 2, 3], None, 4, media_fn=lambda b: {})
    finally:
        eng.shutdown()
    eng2 = ContinuousBatchingEngine(
        model, max_slots=2, slot_ctx=64, chunk_tokens=2,
        prefill_buckets=(16, 32), max_cached_prefixes=2)
    try:
        with pytest.raises(ValueError, match="media_fn"):
            eng2.submit_ids([1, 2, 3], None, 4,
                            media_fn=lambda b: {})
    finally:
        eng2.shutdown()


def test_wrap_adapter_in_engine_generic_path():
    """--use_engine on a GenericChat adapter routes through the generic
    engine and the eval driver scores with it."""
    from tests.test_eval_adapters import make_adapter
    from mantis_tpu.serving.engine import (
        GenericEngineAdapter, wrap_adapter_in_engine)

    chat = make_adapter("idefics3")
    wrapped = wrap_adapter_in_engine(chat)
    assert isinstance(wrapped, GenericEngineAdapter)
    assert wrapped.concurrent_safe
    out = wrapped([{"type": "text", "content": "Is this bright ?"}])
    assert out == chat([{"type": "text", "content": "Is this bright ?"}])
    wrapped.engine.shutdown()


def test_stream_finish_reason_and_usage_chunk():
    """SSE: the final chunk carries the REAL finish_reason (length on
    budget exhaustion) and stream_options.include_usage appends a
    usage chunk; n>1 with stream is rejected."""
    from mantis_tpu.serving.engine import EngineAdapter
    from mantis_tpu.serving.server import ChatAPIServer

    model = _tiny_mantis()
    eng = EngineAdapter(model, max_new_tokens=4, max_slots=2,
                        slot_ctx=64, chunk_tokens=2,
                        prefill_buckets=(16, 32))
    srv = ChatAPIServer(eng)
    body = {"messages": [{"role": "user",
                          "content": "hello there one two"}],
            "max_tokens": 3, "stream": True,
            "stream_options": {"include_usage": True}}
    chunks = list(srv.handle_chat_stream(body))
    finals = [c for c in chunks
              if c["choices"] and c["choices"][0]["finish_reason"]]
    ref = eng.complete(
        [{"type": "text", "content": "hello there one two"}],
        max_new_tokens=3)
    assert finals[-1]["choices"][0]["finish_reason"] == \
        ref["finish_reason"]
    usage_chunks = [c for c in chunks if "usage" in c]
    assert len(usage_chunks) == 1
    u = usage_chunks[0]["usage"]
    assert u["completion_tokens"] == ref["completion_tokens"]
    assert u["total_tokens"] == u["prompt_tokens"] + \
        u["completion_tokens"]

    with pytest.raises(ValueError):
        list(srv.handle_chat_stream({**body, "n": 2}))
    eng.engine.shutdown()


def test_scheduler_death_fails_waiters_fast():
    """A fatal error in the decode loop must FAIL every in-flight and
    queued request (not hang them to timeout) and refuse new work."""
    from mantis_tpu.serving.engine import ContinuousBatchingEngine

    model = _tiny_mantis()
    eng = ContinuousBatchingEngine(
        model, max_slots=2, slot_ctx=64, chunk_tokens=2,
        prefill_buckets=(16, 32), max_cached_prefixes=0)
    boom = RuntimeError("injected device failure")

    def die():
        raise boom

    eng._decode_once = die
    rng = np.random.RandomState(0)
    with pytest.raises(RuntimeError, match="injected"):
        eng.generate_sync(rng.randint(2, 40, size=6).tolist(), None, 4,
                          timeout=30.0)
    with pytest.raises(RuntimeError, match="scheduler died"):
        eng.submit_ids(rng.randint(2, 40, size=6).tolist(), None, 4)


def test_abandoned_stream_cancels_slot():
    """Closing a streaming generator (client disconnect) frees the
    slot instead of decoding to budget."""
    import time as _t

    from mantis_tpu.serving.engine import EngineAdapter

    model = _tiny_mantis()
    eng = EngineAdapter(model, max_new_tokens=64, max_slots=2,
                        slot_ctx=128, chunk_tokens=2,
                        prefill_buckets=(16, 32))
    gen = eng.stream([{"type": "text", "content": "hello there one"}])
    next(gen)          # at least one delta flowed
    gen.close()        # GeneratorExit -> req.cancelled
    deadline = _t.time() + 10
    while _t.time() < deadline and eng.engine.stats()["occupancy"]:
        _t.sleep(0.05)
    assert eng.engine.stats()["occupancy"] == 0
    eng.engine.shutdown()


def test_sse_midstream_error_stays_in_protocol():
    """An error raised lazily by the stream generator AFTER the 200
    preamble becomes an SSE error event + [DONE], not a second HTTP
    response glued onto the stream."""
    import urllib.request

    from mantis_tpu.serving.server import make_server

    class LazyBoom:
        concurrent_safe = True
        support_multi_image = True

        def stream(self, msgs, max_new_tokens=None, _usage_out=None,
                   **kw):
            yield "partial "
            raise ValueError("prompt exceeds the largest prefill bucket")

        def complete(self, msgs, max_new_tokens=None, **kw):
            return {"text": "x"}

        def __call__(self, msgs, **kw):
            return "x"

    srv = make_server(LazyBoom(), port=0)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    url = (f"http://127.0.0.1:{srv.server_address[1]}"
           "/v1/chat/completions")
    req = urllib.request.Request(
        url, data=json.dumps({
            "messages": [{"role": "user", "content": "hi"}],
            "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "text/event-stream"
        payloads = [line.decode().strip()[len("data: "):]
                    for line in r if line.decode().strip()
                    .startswith("data: ")]
    assert payloads[-1] == "[DONE]"
    parsed = [json.loads(x) for x in payloads[:-1]]
    assert any("error" in p for p in parsed)
    assert any(p.get("choices") and
               p["choices"][0]["delta"].get("content") == "partial "
               for p in parsed)
    srv.shutdown()


def test_engine_with_unstacked_lm_identity():
    """The --unstacked_layers serving mode (server.py): the engine's
    programs run over an unrolled per-layer param list (static cache
    slices) and must emit exactly the stacked model's replies."""
    from mantis_tpu.models import llama
    from mantis_tpu.serving.engine import EngineAdapter

    model = _tiny_mantis()
    prompts = [
        ("what is in this <image> ?", [0]),
        ("tell me more about it", None),
    ]

    def msgs(text, seeds):
        out = []
        for part in text.split("<image>"):
            out.append({"type": "text", "content": part})
            if seeds:
                out.append({"type": "image",
                            "content": _img(seeds.pop(0))})
        return [m for m in out if m.get("content") != ""]

    eng = EngineAdapter(model, max_new_tokens=6, max_slots=2,
                        slot_ctx=128, chunk_tokens=3,
                        prefill_buckets=(32, 64))
    expected = [eng(msgs(t, list(s) if s else None))
                for t, s in prompts]
    eng.engine.shutdown()

    model.params = dict(model.params)
    model.params["language_model"] = llama.unstack_layers(
        model.params["language_model"])
    eng_u = EngineAdapter(model, max_new_tokens=6, max_slots=2,
                          slot_ctx=128, chunk_tokens=3,
                          prefill_buckets=(32, 64))
    got = [eng_u(msgs(t, list(s) if s else None))
           for t, s in prompts]
    assert got == expected
    eng_u.engine.shutdown()
