"""Dynamic-batching serving layer: batching semantics + the HTTP surface.

Tiny random checkpoint, CPU, real ThreadingHTTPServer on an ephemeral port,
real concurrent clients — the full production wiring minus the TPU.
"""

import io
import json
import struct
import threading
import urllib.request
import wave

import numpy as np
import pytest

from helpers import make_tiny_checkpoint


def _wav_bytes(seconds=1.0, rate=16000, freq=220.0):
    t = np.arange(int(seconds * rate)) / rate
    pcm = (0.2 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    ck = make_tiny_checkpoint(tmp_path_factory.mktemp("serve") / "ck")
    from distil_whisper_tpu.cli.run_server import build_server
    httpd, transcriber = build_server([
        "--model_checkpoint", ck,
        "--host", "127.0.0.1", "--port", "0",
        "--batch_size", "4", "--max_wait_ms", "400",
        "--max_new_tokens", "6", "--dtype", "float32",
        "--language", "en", "--max_body_mb", "2",
    ])
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", transcriber
    httpd.shutdown()
    transcriber.stop()


def _post(url, body, timeout=300):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    base, _ = server
    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        assert r.status == 200
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["batch_size"] == 4


def test_single_request(server):
    base, _ = server
    status, out = _post(base + "/v1/transcribe?language=en", _wav_bytes())
    assert status == 200
    assert "text" in out and isinstance(out["text"], str)
    assert out["latency_ms"] > 0


def test_concurrent_requests_are_batched(server):
    """4 concurrent posts within the 400 ms window must share device calls:
    every response is correct AND the worker saw a multi-request batch."""
    base, transcriber = server
    before = transcriber.stats["batches"]
    results = [None] * 4
    errors = []

    def post(i):
        try:
            results[i] = _post(base + "/v1/transcribe",
                               _wav_bytes(freq=200.0 + 30 * i))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors
    for status, out in results:
        assert status == 200 and "text" in out
    assert transcriber.stats["max_batch"] >= 2, transcriber.stats
    assert transcriber.stats["batches"] - before <= 3
    # identical model + deterministic decode: same tone batched or not
    # would require goldens; here we only pin transport + batching.


def test_timestamps_and_long_form(server):
    base, transcriber = server
    status, out = _post(base + "/v1/transcribe?timestamps=1", _wav_bytes())
    assert status == 200 and "chunks" in out
    # >30 s input takes the chunked-pipeline fallback
    long_before = transcriber.stats["long_form"]
    status, out = _post(base + "/v1/transcribe", _wav_bytes(seconds=31.0))
    assert status == 200 and "text" in out
    assert transcriber.stats["long_form"] == long_before + 1


def test_bad_request(server):
    base, _ = server
    status = None
    try:
        req = urllib.request.Request(base + "/v1/transcribe",
                                     data=b"not a wav", method="POST")
        urllib.request.urlopen(req, timeout=60)
    except urllib.error.HTTPError as e:
        status = e.code
        body = json.loads(e.read())
        assert "error" in body
    assert status == 400


def test_oversized_body_rejected(server):
    """Bodies over --max_body_mb get 413 (drained in bounded chunks, never
    buffered into memory)."""
    base, _ = server
    status = None
    try:
        req = urllib.request.Request(base + "/v1/transcribe",
                                     data=b"\0" * (3 * 1000 * 1000),
                                     method="POST")
        urllib.request.urlopen(req, timeout=60)
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 413


def test_batched_equals_individual(server):
    """A request served in a multi-request batch must decode exactly the
    same tokens as the same audio served alone (greedy, same program)."""
    base, transcriber = server
    wav = _wav_bytes(freq=330.0)
    _, solo = _post(base + "/v1/transcribe?language=en", wav)

    results = [None] * 3

    def post(i):
        results[i] = _post(base + "/v1/transcribe?language=en", wav)

    threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    for status, out in results:
        assert status == 200
        assert out["text"] == solo["text"]


def test_stats_endpoint_and_server_side_deadline(server):
    """GET /v1/stats exposes the live queue/counter snapshot; a request with
    ``timeout_s`` past its deadline gets 504 and is CANCELLED — the worker
    drops it instead of spending a device call on a gone client."""
    base, transcriber = server
    with urllib.request.urlopen(base + "/v1/stats", timeout=60) as r:
        assert r.status == 200
        snap = json.loads(r.read())
    assert snap["scheduler"] == "microbatch"
    assert snap["max_queue"] == 8 * transcriber.batch_size
    assert "queue_depth" in snap and "stats" in snap

    cancelled_before = transcriber.stats["cancelled"]
    status = None
    try:
        # 1 ms deadline < the 400 ms batching window: always expires
        _post(base + "/v1/transcribe?language=en&timeout_s=0.001",
              _wav_bytes())
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 504
    assert transcriber.stats["cancelled"] == cancelled_before + 1
    # the server keeps serving after the shed request
    st, out = _post(base + "/v1/transcribe?language=en", _wav_bytes())
    assert st == 200 and "text" in out


def test_http_error_mapping_503_504():
    """HTTP status mapping without a model: backlog-full -> 503 +
    Retry-After, deadline -> 504, /v1/stats serves snapshot()."""
    from distil_whisper_tpu.serving import (ServerOverloadedError,
                                            make_http_server)

    class Stub:
        batch_size = 2
        stats = {"requests": 0}
        pipe = None

        def snapshot(self):
            return {"scheduler": "stub", "queue_depth": 7}

        def submit(self, body, timeout=None, **kw):
            if timeout is not None:
                raise TimeoutError("deadline exceeded")
            raise ServerOverloadedError("backlog full")

        def submit_stream(self, body, timeout=None, **kw):
            # plain function (the serving contract): admission errors raise
            # BEFORE the HTTP layer commits a 200 + ndjson headers
            return self.submit(body, timeout=timeout, **kw)

    httpd = make_http_server(Stub(), "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        try:
            _post(base + "/v1/transcribe", b"x")
            raise AssertionError("expected 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert e.headers["Retry-After"] == "1"
        try:
            _post(base + "/v1/transcribe?timeout_s=5", b"x")
            raise AssertionError("expected 504")
        except urllib.error.HTTPError as e:
            assert e.code == 504
        with urllib.request.urlopen(base + "/v1/stats", timeout=60) as r:
            assert json.loads(r.read())["queue_depth"] == 7
        # stream=1 shares the load-shedding contract: the 503 must arrive
        # as a real status line (admission runs before the 200 is sent),
        # not as a mid-stream error line after bogus ndjson headers
        try:
            _post(base + "/v1/transcribe?stream=1", b"x")
            raise AssertionError("expected 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert e.headers["Retry-After"] == "1"
        try:
            _post(base + "/v1/transcribe?stream=1&timeout_s=5", b"x")
            raise AssertionError("expected 504")
        except urllib.error.HTTPError as e:
            assert e.code == 504
    finally:
        httpd.shutdown()


def test_word_ts_burst_is_microbatched(server):
    """Concurrent word-timestamp posts within the batching window share
    device calls (word_ts_max_batch > 1), each row identical to a direct
    single-audio pipeline call."""
    base, transcriber = server
    wavs = [_wav_bytes(freq=205.0 + 25 * i) for i in range(3)]
    results = [None] * 3
    errors = []

    def post(i):
        try:
            results[i] = _post(
                base + "/v1/transcribe?language=en&timestamps=word", wavs[i])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=1200)
    assert not errors
    from distil_whisper_tpu.audio.io import load_audio
    for i in range(3):
        status, out = results[i]
        assert status == 200
        direct = transcriber.pipe(load_audio(wavs[i], 16000), language="en",
                                  return_timestamps="word", max_new_tokens=6)
        assert out["text"] == direct["text"], f"req {i}"
        assert [tuple(c["timestamp"]) for c in out["chunks"]] == \
            [tuple(c["timestamp"]) for c in direct["chunks"]], f"req {i}"
    assert transcriber.stats["word_ts_max_batch"] >= 2, transcriber.stats


def test_sequential_long_form_over_http(server):
    """mode=sequential on a >30 s input: the timestamp-driven sliding
    window (reference README.md:158-171) serves the request, token-identical
    to a directly-constructed SequentialTranscriber."""
    import jax.numpy as jnp
    from distil_whisper_tpu.audio import compute_mel
    from distil_whisper_tpu.audio.io import load_audio
    from distil_whisper_tpu.generation.sequential import (
        SequentialOptions, SequentialTranscriber)

    base, transcriber = server
    wav = _wav_bytes(seconds=33.0, freq=240.0)
    status, out = _post(
        base + "/v1/transcribe?language=en&mode=sequential&max_tokens=6",
        wav, timeout=1200)
    assert status == 200
    assert out["language"] == "en"
    assert isinstance(out["segments"], list)
    for s in out["segments"]:
        assert 0.0 <= s["start"] <= s["end"]
        assert isinstance(s["tokens"], list)

    pipe = transcriber.pipe
    direct_tr = SequentialTranscriber(
        pipe.params, pipe.cfg, pipe.tokenizer,
        SequentialOptions(max_new_tokens=6), language="en",
        task="transcribe", batch_size=1, dtype=pipe.dtype)
    audio = load_audio(wav, pipe.cfg.sampling_rate)
    feat = np.asarray(compute_mel(jnp.asarray(audio), pipe.cfg,
                                  pad_to_chunk=False)[0])
    direct = direct_tr.transcribe([feat])[0]
    assert out["text"] == direct["text"]
    assert [s["tokens"] for s in out["segments"]] == \
        [[int(t) for t in s["tokens"]] for s in direct["segments"]]
    assert transcriber.stats["sequential"] >= 1


def test_beam_search_over_http(server):
    """beams=N rides the batched beam program on short-form groups —
    result identical to a direct pipeline call with num_beams."""
    base, transcriber = server
    wav = _wav_bytes(freq=318.0)
    status, out = _post(base + "/v1/transcribe?language=en&beams=2", wav)
    assert status == 200
    from distil_whisper_tpu.audio.io import load_audio
    direct = transcriber.pipe(load_audio(wav, 16000), language="en",
                              generate_kwargs={"num_beams": 2},
                              max_new_tokens=6)
    assert out["text"] == direct["text"]
    # invalid widths are 400s
    try:
        _post(base + "/v1/transcribe?beams=0", wav)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_mode_validation_over_http(server):
    """Unknown long-form modes and unsupported combinations are 400s, not
    silent downgrades."""
    base, _ = server
    wav = _wav_bytes()
    try:
        _post(base + "/v1/transcribe?mode=bogus", wav)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    try:
        _post(base + "/v1/transcribe?mode=sequential&timestamps=word", wav)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_coerce_timestamps_rejects_unknown_granularity():
    """Direct Python callers asking for an unsupported timestamp granularity
    get a ValueError, not a silent downgrade to segment-level."""
    from distil_whisper_tpu.serving import _coerce_timestamps
    assert _coerce_timestamps("word") == "word"
    assert _coerce_timestamps("WORD") == "word"
    assert _coerce_timestamps("1") is True
    assert _coerce_timestamps("true") is True
    assert _coerce_timestamps("0") is False
    assert _coerce_timestamps("") is False
    assert _coerce_timestamps(True) is True
    assert _coerce_timestamps(False) is False
    with pytest.raises(ValueError):
        _coerce_timestamps("char")
    with pytest.raises(ValueError):
        _coerce_timestamps("Words")


def test_backpressure_rejects_at_max_queue(server):
    """Backlog at max_queue -> ServerOverloadedError at submit time (the
    load-shedding contract), and the bound is honoured at 0 (drain mode)."""
    from distil_whisper_tpu.serving import ServerOverloadedError
    _, transcriber = server
    old = transcriber.max_queue
    transcriber.max_queue = 0
    try:
        import numpy as np
        with pytest.raises(ServerOverloadedError):
            transcriber.submit(np.zeros(1600, np.float32), language="en")
        assert transcriber.stats["rejected"] >= 1
    finally:
        transcriber.max_queue = old


def test_word_timestamps_over_http(server):
    """timestamps=word rides the pipeline's cross-attention alignment path
    (NOT silently downgraded to segment timestamps) and matches a direct
    pipeline call exactly."""
    base, transcriber = server
    wav = _wav_bytes(freq=275.0)
    status, out = _post(base + "/v1/transcribe?language=en&timestamps=word",
                        wav)
    assert status == 200
    assert "chunks" in out
    for c in out["chunks"]:
        assert "text" in c and len(c["timestamp"]) == 2
        s, e = c["timestamp"]
        assert 0.0 <= s <= e

    from distil_whisper_tpu.audio.io import load_audio
    direct = transcriber.pipe(load_audio(wav, 16000), language="en",
                              return_timestamps="word", max_new_tokens=6)
    assert out["text"] == direct["text"]
    assert [tuple(c["timestamp"]) for c in out["chunks"]] == \
        [tuple(c["timestamp"]) for c in direct["chunks"]]
    assert transcriber.stats["word_ts"] >= 1
