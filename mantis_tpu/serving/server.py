"""OpenAI-compatible chat serving endpoint over the eval adapters.

The reference ships its demo as an external HF Space (an empty git
submodule, reference .gitmodules:1-3); here serving is first-party:
any `<arch>:<checkpoint>` the adapter registry resolves
(benchmark/adapters) is servable as `POST /v1/chat/completions`.

    python -m mantis_tpu.serving.server --model mantis-tpu:/ckpts/m8b

Protocol subset (stdlib only, no external server deps):
  - POST /v1/chat/completions
      {"model": ..., "messages": [{"role": "user", "content":
        "text" | [{"type": "text", "text": ...} |
                  {"type": "image_url", "image_url": {"url":
                   "data:image/png;base64,..." or, with
                   --allow_local_files, "file:///path" | "/path"}} |
                  {"type": "video_url", "video_url": {"url": ...}}]}],
       "max_tokens": N, "temperature": T, "top_p": P, "seed": S,
       "stop": "str" | [up to 4 strs], "stream": false}
    -> {"choices": [{"message": {"role": "assistant", "content": ...},
                     "finish_reason": "stop"}]}
    With "stream": true -> text/event-stream of chat.completion.chunk
    events ending in `data: [DONE]` (token-level deltas on the engine
    path, one whole-reply chunk on serial adapters).  temperature>0
    (per-request nucleus sampling, deterministic in seed) requires
    --continuous_batching; greedy requests stay bit-exact.  "stop"
    truncates before the first hit; on the engine it also CANCELS the
    slot (no decode spent past the stop), on serial adapters it
    post-truncates.
  - GET /v1/models -> the loaded model id.
  - GET /v1/metrics -> engine occupancy/throughput counters
      (continuous-batching mode; serial mode reports {"mode": "serial"}).

Multi-turn chats are flattened turn-by-turn into the adapter's
interleaved message list (the adapter renders its own conversation
template); `video_url` is an extension the OpenAI schema lacks —
frames-as-images archs sample uniformly, videollava feeds its video
tower.  Serial adapters run one request at a time behind a lock;
`--continuous_batching` batches concurrent requests on one shared KV
cache (serving/engine.py) with no lock.
"""
import argparse
import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional


def _decode_image(url: str, allow_local_files: bool):
    from PIL import Image

    if url.startswith("data:"):
        b64 = url.split(",", 1)[1]
        return Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
    if not allow_local_files:
        raise ValueError(
            "local file paths are disabled; send a data: URL or start "
            "the server with --allow_local_files")
    if url.startswith("file://"):
        url = url[len("file://"):]
    return Image.open(url).convert("RGB")


def _decode_video(url: str, allow_local_files: bool,
                  temp_files: Optional[list] = None) -> str:
    """-> a local path for the adapter (data: URLs land in a temp file,
    recorded in ``temp_files`` so the caller can unlink it after the
    reply — a long-running server must not leak one file per video
    request)."""
    if url.startswith("data:"):
        import tempfile

        b64 = url.split(",", 1)[1]
        f = tempfile.NamedTemporaryFile(suffix=".mp4", delete=False)
        f.write(base64.b64decode(b64))
        f.close()
        if temp_files is not None:
            temp_files.append(f.name)
        return f.name
    if not allow_local_files:
        raise ValueError(
            "local file paths are disabled; send a data: URL or start "
            "the server with --allow_local_files")
    if url.startswith("file://"):
        url = url[len("file://"):]
    return url


def messages_to_adapter(messages: List[dict],
                        allow_local_files: bool = True,
                        temp_files: Optional[list] = None) -> List[dict]:
    """OpenAI chat messages -> the adapter's interleaved message list.

    Roles other than user are prefixed inline (the adapter template
    supplies the real role markers for the final user turn).
    ``allow_local_files=False`` rejects path-based image_url/video_url
    (the server default when exposed beyond localhost — a remote client
    must not be able to read the server's filesystem)."""
    out = []
    for m in messages:
        role = m.get("role", "user")
        content = m.get("content", "")
        parts = ([{"type": "text", "text": content}]
                 if isinstance(content, str) else content)
        for p in parts:
            t = p.get("type")
            if t == "text":
                text = p["text"]
                if role != "user" and text:
                    text = f"{role}: {text}"
                out.append({"type": "text", "content": text})
            elif t == "image_url":
                out.append({"type": "image",
                            "content": _decode_image(
                                p["image_url"]["url"],
                                allow_local_files)})
            elif t == "video_url":
                out.append({"type": "video",
                            "content": _decode_video(
                                p["video_url"]["url"],
                                allow_local_files, temp_files)})
            else:
                raise ValueError(f"unsupported content type: {t!r}")
    return out


def _unlink_all(paths):
    import os

    for f in paths:
        try:
            os.unlink(f)
        except OSError:
            pass


class ChatAPIServer:
    """Wraps one adapter instance behind the HTTP protocol above."""

    def __init__(self, adapter, model_id: str = "mantis-tpu",
                 allow_local_files: bool = False):
        self.adapter = adapter
        self.model_id = model_id
        self.allow_local_files = allow_local_files
        self._lock = threading.Lock()

    # ------------------------------------------------------------------
    @staticmethod
    def _sampling_kwargs(body: dict) -> dict:
        """temperature/top_p/seed from the request body; absent
        temperature means greedy (the engine's bit-exact default)."""
        out = {}
        if body.get("temperature") is not None:
            out["temperature"] = float(body["temperature"])
        if body.get("top_p") is not None:
            out["top_p"] = float(body["top_p"])
        if body.get("seed") is not None:
            out["seed"] = int(body["seed"])
        return out

    @staticmethod
    def _stop_list(body: dict):
        """OpenAI ``stop``: a string or up to 4 strings."""
        stop = body.get("stop")
        if stop is None:
            return []
        if isinstance(stop, str):
            stop = [stop]
        if not isinstance(stop, list) or not all(
                isinstance(s, str) and s for s in stop):
            raise ValueError(
                "stop must be a non-empty string or a list of them")
        return stop[:4]

    @staticmethod
    def _truncate_at_stop(text: str, stops) -> str:
        from mantis_tpu.serving.engine import first_stop_index

        cut = first_stop_index(text, stops)
        return text[:cut].rstrip() if cut >= 0 else text

    def handle_chat(self, body: dict) -> dict:
        tmp_files: list = []
        try:
            return self._handle_chat(body, tmp_files)
        finally:
            _unlink_all(tmp_files)

    def _handle_chat(self, body: dict, tmp_files: list) -> dict:
        msgs = messages_to_adapter(
            body.get("messages", []),
            allow_local_files=self.allow_local_files,
            temp_files=tmp_files)
        max_tokens = body.get("max_tokens") or body.get(
            "max_completion_tokens")
        n = int(body.get("n") or 1)
        if not 1 <= n <= 8:
            raise ValueError(f"n must be in [1, 8], got {n}")
        sampling = self._sampling_kwargs(body)
        stops = self._stop_list(body)
        usage = None
        finishes = ["stop"]
        if getattr(self.adapter, "concurrent_safe", False):
            # continuous-batching engine (serving/engine.py): handler
            # threads submit concurrently, the engine batches their
            # decodes on one shared KV cache — no serialization lock
            if stops and getattr(self.adapter, "supports_stop", False):
                sampling["stop"] = stops
                stops = []          # handled (with early cancel) inside
            mnt = int(max_tokens) if max_tokens else None

            def one(i):
                kw = dict(sampling)
                # n>1 choices draw from distinct streams: offset the
                # seed per choice (unseeded sampled requests already
                # differ via the engine's auto-seed)
                if i and kw.get("seed") is not None:
                    kw["seed"] = int(kw["seed"]) + i
                return self.adapter.complete(msgs, max_new_tokens=mnt,
                                             **kw)

            if n == 1:
                outs = [one(0)]
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=n) as ex:
                    outs = list(ex.map(one, range(n)))
            texts = [o["text"] for o in outs]
            finishes = [o.get("finish_reason", "stop") for o in outs]
            if all("prompt_tokens" in o for o in outs):
                usage = {
                    "prompt_tokens": outs[0]["prompt_tokens"],
                    "completion_tokens": sum(
                        o["completion_tokens"] for o in outs),
                    "total_tokens": outs[0]["prompt_tokens"] + sum(
                        o["completion_tokens"] for o in outs),
                }
        else:
            if n != 1:
                raise ValueError(
                    "n > 1 requires the continuous-batching engine "
                    "(--continuous_batching)")
            if sampling.get("temperature", 0.0) > 0.0:
                raise ValueError(
                    "temperature sampling requires the continuous-"
                    "batching engine (--continuous_batching); the "
                    "serial adapter decodes greedily")
            with self._lock:
                saved = getattr(self.adapter, "max_new_tokens", None)
                if max_tokens and saved is not None:
                    self.adapter.max_new_tokens = int(max_tokens)
                try:
                    texts = [self.adapter(msgs)]
                finally:
                    if max_tokens and saved is not None:
                        self.adapter.max_new_tokens = saved
        if stops:
            # adapters without native stop support: post-truncate (no
            # early exit, but protocol-correct output)
            texts = [self._truncate_at_stop(t, stops) for t in texts]
        out = {
            "id": f"chatcmpl-{int(time.time() * 1000)}",
            "object": "chat.completion",
            "created": int(time.time()),
            "model": body.get("model", self.model_id),
            "choices": [{
                "index": i,
                "message": {"role": "assistant", "content": t},
                "finish_reason": f,
            } for i, (t, f) in enumerate(zip(texts, finishes))],
        }
        if usage is not None:
            # real counts from the engine; omitted (spec-optional) for
            # serial adapters, where null counts break typed clients
            out["usage"] = usage
        return out

    def handle_chat_stream(self, body: dict):
        """Return an iterator of chat.completion.chunk payloads (SSE).
        The engine adapter streams real token deltas; adapters without
        a .stream generator fall back to one whole-reply chunk.
        Request parsing is eager so malformed requests 400 before any
        SSE bytes go out."""
        if int(body.get("n") or 1) != 1:
            raise ValueError("n > 1 is not supported with stream=true")
        usage = {}
        final = {}
        tmp_files: list = []
        if hasattr(self.adapter, "stream") and getattr(
                self.adapter, "concurrent_safe", False):
            msgs = messages_to_adapter(
                body.get("messages", []),
                allow_local_files=self.allow_local_files,
                temp_files=tmp_files)
            max_tokens = body.get("max_tokens") or body.get(
                "max_completion_tokens")
            kw = self._sampling_kwargs(body)
            stops = self._stop_list(body)
            if stops:
                kw["stop"] = stops
            deltas = self.adapter.stream(
                msgs, max_new_tokens=int(max_tokens)
                if max_tokens else None, _usage_out=usage, **kw)
        else:
            reply = self.handle_chat(body)
            deltas = iter(
                [reply["choices"][0]["message"]["content"]])
            final = reply["choices"][0]
        include_usage = bool(
            (body.get("stream_options") or {}).get("include_usage"))

        def gen():
            cid = f"chatcmpl-{int(time.time() * 1000)}"
            base = {"id": cid, "object": "chat.completion.chunk",
                    "created": int(time.time()),
                    "model": body.get("model", self.model_id)}
            try:
                yield {**base, "choices": [{
                    "index": 0, "delta": {"role": "assistant"},
                    "finish_reason": None}]}
                for d in deltas:
                    yield {**base, "choices": [{
                        "index": 0, "delta": {"content": d},
                        "finish_reason": None}]}
            finally:
                _unlink_all(tmp_files)
            # the engine fills `usage` (incl. the real finish_reason)
            # as its stream drains; serial fallbacks reuse handle_chat's
            finish = usage.get("finish_reason",
                               final.get("finish_reason", "stop"))
            yield {**base, "choices": [{
                "index": 0, "delta": {}, "finish_reason": finish}]}
            if include_usage and "prompt_tokens" in usage:
                yield {**base, "choices": [], "usage": {
                    "prompt_tokens": usage["prompt_tokens"],
                    "completion_tokens": usage["completion_tokens"],
                    "total_tokens": usage["prompt_tokens"]
                    + usage["completion_tokens"]}}

        return gen()

    def handle_models(self) -> dict:
        return {"object": "list",
                "data": [{"id": self.model_id, "object": "model",
                          "owned_by": "mantis-tpu"}]}

    def handle_metrics(self) -> dict:
        """Engine occupancy/throughput counters (continuous batching
        only; serial adapters report just the mode)."""
        engine = getattr(self.adapter, "engine", None)
        if engine is None or not hasattr(engine, "stats"):
            return {"mode": "serial"}
        return {"mode": "continuous_batching", **engine.stats()}


def make_server(adapter, host: str = "127.0.0.1", port: int = 8000,
                model_id: str = "mantis-tpu",
                allow_local_files: bool = False) -> ThreadingHTTPServer:
    api = ChatAPIServer(adapter, model_id=model_id,
                        allow_local_files=allow_local_files)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path.rstrip("/") == "/v1/models":
                self._send(200, api.handle_models())
            elif self.path.rstrip("/") == "/v1/metrics":
                self._send(200, api.handle_metrics())
            else:
                self._send(404, {"error": {"message": "not found"}})

        def _send_sse(self, events):
            """text/event-stream; HTTP/1.0 close-delimited (no
            Content-Length), flushed per event so clients see tokens
            as they decode.  Errors raised lazily by the generator
            AFTER the 200 preamble is on the wire stay INSIDE the SSE
            protocol (an error event + [DONE]) — appending a second
            HTTP response there would corrupt the stream."""
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            try:
                for ev in events:
                    self.wfile.write(
                        b"data: " + json.dumps(ev).encode() + b"\n\n")
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                raise                      # client went away: stop
            except Exception as e:
                self.wfile.write(
                    b"data: " + json.dumps({"error": {
                        "message": f"{type(e).__name__}: {e}"}}).encode()
                    + b"\n\n")
            self.wfile.write(b"data: [DONE]\n\n")

        def do_POST(self):
            if self.path.rstrip("/") != "/v1/chat/completions":
                self._send(404, {"error": {"message": "not found"}})
                return
            started_sse = False
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if body.get("stream"):
                    # request parsing/validation errors raise HERE
                    # (eager) and still get a clean 400; once _send_sse
                    # starts, errors stay inside the SSE protocol
                    events = api.handle_chat_stream(body)
                    started_sse = True
                    self._send_sse(events)
                else:
                    self._send(200, api.handle_chat(body))
            except (BrokenPipeError, ConnectionResetError):
                pass               # client disconnected mid-response
            except Exception as e:  # surfaced to the client, not fatal
                if started_sse:
                    raise          # _send_sse already handled protocol
                self._send(400, {"error": {
                    "message": f"{type(e).__name__}: {e}"}})

    return ThreadingHTTPServer((host, port), Handler)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   help="<arch>:<checkpoint_dir> (adapter registry name)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_new_tokens", type=int, default=512)
    p.add_argument("--speculative", type=int, default=0,
                   help="prompt-lookup speculative decoding drafts per "
                        "verify pass (flagship mllava/mantis-tpu "
                        "adapter, greedy only; 0 = off)")
    p.add_argument("--kv_cache", default=None,
                   choices=["bfloat16", "float32", "int8"],
                   help="KV cache dtype (default bfloat16, or int8 "
                        "when --quantize is set); int8 halves KV "
                        "memory (~+14%% decode, 2x batch capacity, "
                        "docs/PERF.md)")
    p.add_argument("--quantize", default=None,
                   choices=["int8", "int4"],
                   help="weight-only LM quantization at load (any "
                        "in-repo family adapter): int8 is the measured "
                        "serving config — an 8B bf16 checkpoint does "
                        "not fit one 16 GB v5e; implies --kv_cache "
                        "int8 unless overridden")
    p.add_argument("--allow_local_files", action="store_true",
                   help="let clients reference server-filesystem paths "
                        "in image_url/video_url (trusted networks only)")
    p.add_argument("--continuous_batching", action="store_true",
                   help="batch concurrent requests on one shared KV "
                        "cache (serving/engine.py; mantis-tpu adapter; "
                        "greedy + per-request temperature/top_p)")
    p.add_argument("--max_slots", type=int, default=8,
                   help="concurrent decode streams (batch 8-16 is the "
                        "measured capacity edge, docs/PERF.md)")
    p.add_argument("--slot_ctx", type=int, default=2048,
                   help="per-stream context (prompt + generation)")
    p.add_argument("--chunk_tokens", type=int, default=8,
                   help="decode steps fused per engine iteration")
    p.add_argument("--prefill_chunk", type=int, default=0,
                   help="admit prompts longer than this in incremental-"
                        "prefill pieces, interleaving decode chunks so "
                        "co-resident streams stall at most one piece "
                        "per admission (0 = whole-prompt prefill)")
    p.add_argument("--unstacked_layers", action="store_true",
                   help="unroll the LM's layer loop in every jitted "
                        "program (static KV-cache slices; XLA can "
                        "prefetch layer i+1's weights under layer i's "
                        "compute, which a scanned layer loop cannot): "
                        "measured +2%% decode / +5%% 8-stream serving "
                        "aggregate at flagship depth, for minutes of "
                        "extra cold-compile time across the engine's "
                        "program set (docs/PERF.md)")
    p.add_argument("--prefix_cache", type=int, default=2,
                   help="keep the last N prompts' KV on device and "
                        "prefill only the suffix for new prompts "
                        "sharing a (tokens+image bytes) prefix "
                        "(shared system prompts / few-shot headers; "
                        "0 = off)")
    args = p.parse_args()

    from mantis_tpu.benchmark.adapters import MLLM_Models

    import jax.numpy as jnp

    factory = MLLM_Models(args.model)
    if args.quantize:
        import inspect

        try:
            takes_kwargs = any(
                p.kind is inspect.Parameter.VAR_KEYWORD
                or p.name == "quantize"
                for p in inspect.signature(factory).parameters.values())
        except (TypeError, ValueError):
            takes_kwargs = False
        if not takes_kwargs:
            raise SystemExit(
                f"--quantize: adapter for {args.model!r} does not "
                f"support on-load quantization (supported: the in-repo "
                f"family adapters, e.g. mantis-tpu:/ idefics2:/ "
                f"qwen2_vl:/)")
        adapter = factory(quantize=args.quantize)
        # quantized loads default the KV cache to int8 (the measured
        # serving pairing); an explicit --kv_cache still overrides
        if args.kv_cache is None:
            args.kv_cache = "int8"
    else:
        adapter = factory()
    args.kv_cache = args.kv_cache or "bfloat16"
    if args.unstacked_layers:
        from mantis_tpu.models import llama as _llama

        lm_holder = (adapter if hasattr(adapter, "params")
                     else getattr(adapter, "model", None))
        if lm_holder is None or "language_model" not in getattr(
                lm_holder, "params", {}):
            raise SystemExit(
                "--unstacked_layers: adapter has no language_model "
                "param tree to unroll")
        lm_holder.params = dict(lm_holder.params)
        lm_holder.params["language_model"] = _llama.unstack_layers(
            lm_holder.params["language_model"])
    if hasattr(adapter, "max_new_tokens"):
        adapter.max_new_tokens = args.max_new_tokens
    # MantisTPUAdapter holds the dtype on its inner MantisLlava model
    kv_target = (adapter if hasattr(adapter, "cache_dtype")
                 else getattr(adapter, "model", None))
    if kv_target is not None and hasattr(kv_target, "cache_dtype"):
        kv_target.cache_dtype = {"bfloat16": jnp.bfloat16,
                                 "float32": jnp.float32,
                                 "int8": jnp.int8}[args.kv_cache]
    elif args.kv_cache != "bfloat16":
        raise SystemExit(
            f"--kv_cache {args.kv_cache}: adapter "
            f"{type(adapter).__name__} has no cache_dtype")
    if args.speculative and not args.continuous_batching:
        # same resolution order as --kv_cache: the adapter itself,
        # then its inner model (MantisTPUAdapter holds a MantisLlava)
        spec_target = (adapter if hasattr(adapter, "speculative")
                       else getattr(adapter, "model", None))
        if spec_target is None or not hasattr(spec_target,
                                              "speculative"):
            raise SystemExit(
                f"--speculative: adapter {type(adapter).__name__} "
                f"has no speculative decode path")
        spec_target.speculative = args.speculative
    if args.continuous_batching:
        from mantis_tpu.serving.engine import (
            EngineAdapter, GenericEngineAdapter)

        inner = getattr(adapter, "model", None)
        if inner is not None and hasattr(inner, "pick_conversation"):
            adapter = EngineAdapter(
                inner, max_new_tokens=args.max_new_tokens,
                max_slots=args.max_slots, slot_ctx=args.slot_ctx,
                chunk_tokens=args.chunk_tokens,
                max_cached_prefixes=args.prefix_cache,
                spec_tokens=args.speculative,
                prefill_chunk=args.prefill_chunk)
        elif hasattr(adapter, "gen_forward"):
            # non-flagship families: the engine core is arch-agnostic;
            # flagship-only layers (prefix cache / chunked prefill /
            # speculative) are rejected or disabled
            if args.speculative or args.prefill_chunk:
                raise SystemExit(
                    "--speculative/--prefill_chunk require the "
                    "flagship mantis-tpu adapter's engine")
            if args.prefix_cache:
                print(f"note: the prefix cache is flagship-only; "
                      f"disabled for {type(adapter).__name__}")
            adapter = GenericEngineAdapter(
                adapter, max_new_tokens=args.max_new_tokens,
                max_slots=args.max_slots, slot_ctx=args.slot_ctx,
                chunk_tokens=args.chunk_tokens)
        else:
            raise SystemExit(
                f"--continuous_batching: adapter "
                f"{type(adapter).__name__} is not engine-servable "
                f"(supported: mantis-tpu and the GenericChat families)")
    srv = make_server(adapter, args.host, args.port,
                      model_id=args.model,
                      allow_local_files=args.allow_local_files)
    print(f"serving {args.model} on http://{args.host}:{args.port}/v1",
          flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
