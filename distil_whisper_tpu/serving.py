"""Dynamic-batching transcription serving (TPU front-end).

The reference ships no serving layer (its user surface stops at
``FlaxWhisperPipeline``, /root/reference/training/flax/distil_whisper/
pipeline.py) — but a TPU earns its keep at batch size, not request-at-a-
time: one 30 s window and sixteen cost nearly the same device call (the
encoder is one matmul-bound pass, the decode loop is weight/KV-read bound
and amortises over the batch — docs/PERFORMANCE.md).  This module is the
piece that turns concurrent single requests into those batches:

* :class:`BatchingTranscriber` — a worker thread that drains a request
  queue into micro-batches (up to ``batch_size`` requests or
  ``max_wait_ms``, whichever first), groups them by generation options,
  and runs each group as ONE device call through the pipeline's jitted
  generate (same compiled program every batch: fixed shapes, ragged tails
  padded).  Audio longer than one 30 s window falls back to the full
  chunked pipeline (still batched across its own windows).
* :func:`make_http_server` — a stdlib ``ThreadingHTTPServer`` exposing
  ``POST /v1/transcribe`` (WAV bytes in, JSON out) and ``GET /healthz``.
  Each HTTP thread blocks on its request's completion event; the batching
  worker owns the device.

Zero new dependencies (stdlib http.server + the in-tree WAV reader).
CLI: ``python -m distil_whisper_tpu.cli.run_server``.
"""

from __future__ import annotations

import json
import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger("distil_whisper_tpu")


class ServerOverloadedError(RuntimeError):
    """The request backlog is at ``max_queue`` — reject instead of queueing
    unboundedly (the HTTP layer maps this to 503 + Retry-After, the
    load-shedding contract every serving deployment needs: a client retry
    against a drained queue beats an ever-growing latency tail)."""


def _coerce_timestamps(return_timestamps):
    """True/False/"word" — the pipeline's contract; anything truthy that
    isn't "word" means segment-level."""
    return (return_timestamps if return_timestamps == "word"
            else bool(return_timestamps))


@dataclass
class _Request:
    audio: np.ndarray                       # float32 mono @ cfg.sampling_rate
    language: Optional[str]
    task: str
    return_timestamps: Any                  # False | True | "word"
    max_new_tokens: Optional[int] = None    # per-request cap (<= server max)
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[Dict[str, Any]] = None
    error: Optional[str] = None
    # set by the client thread when it stops waiting (timeout / disconnect);
    # the worker drops cancelled requests instead of spending device time on
    # output nobody will read.  Plain bool: a lost race only means the work
    # runs once more, never corruption.
    cancelled: bool = False


class BatchingTranscriber:
    """Micro-batching front-end over a :class:`pipeline.WhisperPipeline`.

    ``submit()`` blocks the calling (HTTP) thread until its request's batch
    has run; the single worker thread owns all device calls, so there is
    never device contention between concurrent requests.
    """

    def __init__(self, pipe, batch_size: Optional[int] = None,
                 max_wait_ms: float = 50.0, default_language=None,
                 max_new_tokens: Optional[int] = None,
                 max_queue: Optional[int] = None):
        self.pipe = pipe
        self.batch_size = batch_size or pipe.batch_size
        self.max_wait_s = max_wait_ms / 1e3
        self.default_language = default_language
        self.max_new_tokens = max_new_tokens or pipe.max_new_tokens
        # backlog bound (requests waiting for a worker slot); None -> 8
        # batches deep.  0 is honoured (shed everything — drain mode).
        self.max_queue = (8 * self.batch_size if max_queue is None
                          else int(max_queue))
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        self.stats = {"requests": 0, "batches": 0, "max_batch": 0,
                      "long_form": 0, "word_ts": 0, "rejected": 0,
                      "cancelled": 0}

    # ------------------------------------------------------------- lifecycle
    def start(self) -> "BatchingTranscriber":
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="batching-transcriber")
        self._worker.start()
        return self

    def stop(self) -> None:
        if self._worker is not None:
            self._q.put(None)
            self._worker.join(timeout=30)
            self._worker = None

    # --------------------------------------------------------------- client
    def submit(self, audio, language: Optional[str] = None,
               task: str = "transcribe", return_timestamps: bool = False,
               timeout: Optional[float] = None,
               max_new_tokens: Optional[int] = None) -> Dict[str, Any]:
        """Blocking transcription of one audio (any load_audio source).

        ``max_new_tokens`` caps this request's output (clamped to the server
        budget).  Greedy decoding has the prefix property — the first N
        tokens of a longer run equal an N-budget run — so short-form serves
        it by truncation (same compiled program for every request)."""
        from .audio.io import load_audio
        wav = load_audio(audio, self.pipe.cfg.sampling_rate)
        req = _Request(wav, language or self.default_language, task,
                       _coerce_timestamps(return_timestamps), max_new_tokens)
        self._enqueue(req)
        if not req.done.wait(timeout):
            req.cancelled = True  # worker skips it; nobody reads the result
            self.stats["cancelled"] += 1
            raise TimeoutError("transcription timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result

    def _enqueue(self, req: _Request) -> None:
        # qsize is approximate under concurrency — fine for load shedding
        # (an off-by-a-few admission is harmless; unbounded growth is not)
        if self._q.qsize() >= self.max_queue:
            self.stats["rejected"] += 1
            raise ServerOverloadedError(
                f"request backlog at max_queue={self.max_queue}")
        self._q.put(req)

    def snapshot(self) -> Dict[str, Any]:
        """Live observability view (GET /v1/stats)."""
        return {"scheduler": "microbatch",
                "queue_depth": self._q.qsize(),
                "max_queue": self.max_queue,
                "batch_size": self.batch_size,
                "stats": dict(self.stats)}

    def submit_stream(self, audio, **kw):
        """Streaming facade for API parity with the continuous-batching
        transcriber (which emits true incremental partials): whole-batch
        generate produces no intermediate state to stream, so this yields
        one final result."""
        yield {**self.submit(audio, **kw), "final": True}

    # --------------------------------------------------------------- worker
    def _run(self) -> None:
        while True:
            req = self._q.get()
            if req is None:
                return
            batch = [req]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._dispatch(batch)
                    return
                batch.append(nxt)
            self._dispatch(batch)

    def _dispatch(self, batch: List[_Request]) -> None:
        # drop requests whose client stopped waiting (timed out /
        # disconnected) — device time spent on them is pure waste
        batch = [r for r in batch if not r.cancelled]
        if not batch:
            return
        self.stats["requests"] += len(batch)
        n_samples = self.pipe.cfg.n_samples
        groups: Dict[Any, List[_Request]] = {}
        for r in batch:
            if len(r.audio) > n_samples or r.return_timestamps == "word":
                # long-form (the chunked pipeline already batches this
                # file's own windows) and word-level timestamps (needs the
                # pipeline's cross-attention alignment pass) both take the
                # whole-pipeline path; rare in interactive serving
                if len(r.audio) > n_samples:
                    self.stats["long_form"] += 1
                if r.return_timestamps == "word":
                    self.stats["word_ts"] += 1
                self._run_one_pipeline(r)
                continue
            groups.setdefault((r.language, r.task, r.return_timestamps),
                              []).append(r)
        for (lang, task, ts), reqs in groups.items():
            self._run_short_group(reqs, lang, task, ts)

    def _run_one_pipeline(self, r: _Request) -> None:
        try:
            max_new = self.max_new_tokens
            if r.max_new_tokens is not None:
                max_new = max(1, min(int(r.max_new_tokens), max_new))
            r.result = self.pipe(r.audio, language=r.language, task=r.task,
                                 return_timestamps=r.return_timestamps,
                                 max_new_tokens=max_new)
        except Exception as e:  # noqa: BLE001
            logger.exception("pipeline-path request failed")
            r.error = f"{type(e).__name__}: {e}"
        finally:
            r.done.set()

    def _run_short_group(self, reqs: List[_Request], language, task: str,
                         return_timestamps: bool) -> None:
        """ONE device call for up to batch_size single-window requests."""
        import jax
        import jax.numpy as jnp
        from .audio import compute_mel
        from .generation import GenerationOptions

        pipe, cfg, tok = self.pipe, self.pipe.cfg, self.pipe.tokenizer
        try:
            bsz = -(-len(reqs) // pipe.n_data) * pipe.n_data
            bsz = max(bsz, pipe.n_data)
            wavs = np.zeros((bsz, cfg.n_samples), np.float32)
            for j, r in enumerate(reqs):
                wavs[j, :len(r.audio)] = r.audio
            mels = compute_mel(jnp.asarray(wavs), cfg).astype(pipe.dtype)

            if language is None and len(tok.lang_to_id) > 1:
                language = pipe.detect_language(mels[:1])[0]
            prompt = tok.prompt_ids(language=language, task=task,
                                    no_timestamps=not return_timestamps)
            opts = GenerationOptions.from_config(
                cfg, max_new_tokens=self.max_new_tokens,
                return_timestamps=return_timestamps,
                no_speech_token_id=tok.no_speech)
            fn = pipe._jitted_generate(opts, len(prompt))
            prompts = jnp.asarray([prompt] * bsz, jnp.int32)
            out = fn(pipe.params, pipe._put_batch(mels), prompts, 0.0,
                     jax.random.PRNGKey(0))
            seqs = np.asarray(out.sequences)
            lens = np.asarray(out.seq_len)

            self.stats["batches"] += 1
            self.stats["max_batch"] = max(self.stats["max_batch"], len(reqs))
            for j, r in enumerate(reqs):
                cut = lens[j]
                if r.max_new_tokens is not None:
                    cut = min(cut, len(prompt) + max(int(r.max_new_tokens), 0))
                ids = seqs[j][:cut].tolist()
                result = {"text": tok.decode(ids, skip_special_tokens=True)}
                if return_timestamps:
                    _, opt = tok.decode_asr([{"tokens": ids}],
                                            return_timestamps=True)
                    result.update(opt)
                r.result = result
        except Exception as e:  # noqa: BLE001
            logger.exception("batched request group failed")
            for r in reqs:
                r.error = f"{type(e).__name__}: {e}"
        finally:
            for r in reqs:
                r.done.set()


# ---------------------------------------------------------------- HTTP layer
def make_http_server(transcriber: BatchingTranscriber, host: str = "0.0.0.0",
                     port: int = 8000, max_body_mb: float = 100.0):
    """ThreadingHTTPServer: POST /v1/transcribe (WAV body; query params
    ``language``, ``task``, ``timestamps=1``, ``max_tokens=N``,
    ``timeout_s=S`` — server-side deadline), GET /healthz, and
    GET /v1/stats (live queue/lane/counters snapshot).  Works over any
    transcriber with the ``submit()`` contract (micro-batching or
    continuous-batching).  Error mapping: backlog full -> 503 +
    Retry-After (load shedding), deadline exceeded -> 504 (the request is
    cancelled — the worker stops spending device time on it), bodies over
    ``max_body_mb`` -> 413 before being read."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    max_body = int(max_body_mb * 1e6)

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: Dict[str, Any],
                  headers: Optional[Dict[str, str]] = None) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            path = urlparse(self.path).path
            if path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "checkpoint": getattr(transcriber.pipe, "_checkpoint",
                                          None),
                    "batch_size": transcriber.batch_size,
                    "stats": dict(transcriber.stats)})
            elif path == "/v1/stats":
                self._json(200, transcriber.snapshot())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path not in ("/v1/transcribe", "/transcribe"):
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length > max_body:
                    # drain in bounded chunks (never buffered) before
                    # responding — answering mid-upload resets the client's
                    # send and it sees a broken pipe instead of the 413
                    remaining = length
                    while remaining > 0:
                        chunk = self.rfile.read(min(remaining, 1 << 16))
                        if not chunk:
                            break
                        remaining -= len(chunk)
                    self._json(413, {"error": f"body {length} bytes exceeds "
                                              f"limit {max_body}"})
                    return
                body = self.rfile.read(length)
                q = parse_qs(url.query)
                max_tok = (q.get("max_tokens") or [None])[0]
                timeout_s = (q.get("timeout_s") or [None])[0]
                ts = (q.get("timestamps") or ["0"])[0]
                kw = dict(
                    language=(q.get("language") or [None])[0],
                    task=(q.get("task") or ["transcribe"])[0],
                    # "word" -> word-level spans via the cross-attention
                    # alignment pass; "1"/"true" -> segment timestamps
                    return_timestamps=("word" if ts == "word"
                                       else ts in ("1", "true")),
                    max_new_tokens=int(max_tok) if max_tok else None,
                    timeout=float(timeout_s) if timeout_s else None)
                t0 = time.monotonic()
                if (q.get("stream") or ["0"])[0] in ("1", "true"):
                    # newline-delimited JSON, close-delimited (HTTP/1.0):
                    # one partial line per decode block (continuous
                    # scheduler), then the final result with final=true
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/x-ndjson")
                    self.send_header("Cache-Control", "no-cache")
                    self.end_headers()
                    gen = transcriber.submit_stream(body, **kw)
                    try:
                        for item in gen:
                            if item.get("final"):
                                item = dict(item)
                                item["latency_ms"] = round(
                                    (time.monotonic() - t0) * 1e3, 1)
                            self.wfile.write(json.dumps(item).encode()
                                             + b"\n")
                            self.wfile.flush()
                    except OSError:
                        # client disconnected mid-stream: closing the
                        # generator cancels the in-flight request so the
                        # engine reclaims its lane
                        gen.close()
                        logger.info("streaming client disconnected")
                    except Exception:  # noqa: BLE001 — headers already sent:
                        # emit an error line and close (no second status line)
                        gen.close()
                        logger.exception("streaming request failed")
                        try:
                            self.wfile.write(b'{"error": "stream aborted"}\n')
                        except OSError:
                            pass  # client already gone
                    return
                result = dict(transcriber.submit(body, **kw))
                result["latency_ms"] = round(
                    (time.monotonic() - t0) * 1e3, 1)
                self._json(200, result)
            except ServerOverloadedError as e:
                self._json(503, {"error": str(e)},
                           headers={"Retry-After": "1"})
            except TimeoutError as e:
                self._json(504, {"error": str(e)})
            except Exception as e:  # noqa: BLE001
                logger.exception("request failed")
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet; logging owns output
            logger.debug("http: " + fmt, *args)

    return ThreadingHTTPServer((host, port), Handler)
