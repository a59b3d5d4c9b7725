"""Speculative decoding on the serving surface (--assistant_checkpoint).

The reference's headline serving capability (README.md:352-432): a draft
model proposes, the served model verifies, outputs token-identical to plain
greedy.  Here: a real HTTP server with a tiny random teacher + a distinct
tiny random draft; responses must match a plain (non-speculative)
transcriber over the same pipeline exactly.
"""

import io
import json
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


def _post(url, body, timeout=600):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def spec_server(tmp_path_factory):
    root = tmp_path_factory.mktemp("spec")
    teacher_ck = make_tiny_checkpoint(root / "teacher", decoder_layers=2,
                                      seed=0)
    # a DIFFERENT model (1 decoder layer, fresh seed, same width so the
    # encoder is shared — the reference's distil-draft setup): with random
    # weights it rarely agrees with the teacher, the worst case for the
    # accept rate, which is exactly what the identity guarantee must survive
    draft_ck = make_tiny_checkpoint(root / "draft", decoder_layers=1, seed=7)
    from distil_whisper_tpu.cli.run_server import build_server
    httpd, transcriber = build_server([
        "--model_checkpoint", teacher_ck,
        "--assistant_checkpoint", draft_ck, "--gamma", "3",
        "--host", "127.0.0.1", "--port", "0",
        "--batch_size", "2", "--max_wait_ms", "50",
        "--max_new_tokens", "8", "--dtype", "float32",
        "--language", "en",
    ])
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", transcriber
    httpd.shutdown()
    transcriber.stop()


def test_speculative_token_identity_over_http(spec_server):
    """A speculative server's transcription == plain greedy over the same
    pipeline, for several distinct inputs (the accept/verify loop may take
    any acceptance path — output must not depend on it)."""
    from distil_whisper_tpu.serving import BatchingTranscriber

    base, spec_tr = spec_server
    plain = BatchingTranscriber(spec_tr.pipe, batch_size=2,
                                default_language="en",
                                max_new_tokens=8).start()
    try:
        for freq in (220.0, 341.0, 452.0):
            wav = _wav_bytes(freq=freq)
            status, out = _post(base + "/v1/transcribe?language=en", wav)
            assert status == 200
            ref = plain.submit(wav, language="en")
            assert out["text"] == ref["text"], f"freq={freq}"
    finally:
        plain.stop()
    assert spec_tr.stats["speculative_batches"] >= 3
    assert spec_tr.stats["drafted"] > 0


def test_speculative_stats_surface(spec_server):
    """/v1/stats exposes the speculative block with the live acceptance
    rate once traffic has flowed."""
    base, _ = spec_server
    _post(base + "/v1/transcribe?language=en", _wav_bytes(freq=300.0))
    with urllib.request.urlopen(base + "/v1/stats", timeout=60) as r:
        snap = json.loads(r.read())
    assert snap["speculative"]["gamma"] == 3
    assert snap["speculative"]["acceptance_rate"] is not None
    assert 0.0 <= snap["speculative"]["acceptance_rate"] <= 1.0


def test_timestamped_requests_ride_speculation(spec_server):
    """Segment-timestamp requests ride the accept/verify loop (the Whisper
    FSM runs per verify column — generation.speculative) and the output is
    identical to the plain pipeline's timestamped greedy decode."""
    from distil_whisper_tpu.serving import BatchingTranscriber
    base, spec_tr = spec_server
    before = spec_tr.stats["speculative_batches"]
    wav = _wav_bytes(freq=260.0)
    status, out = _post(base + "/v1/transcribe?language=en&timestamps=1",
                        wav)
    assert status == 200
    assert "chunks" in out
    assert spec_tr.stats["speculative_batches"] == before + 1
    plain = BatchingTranscriber(spec_tr.pipe, batch_size=2,
                                default_language="en",
                                max_new_tokens=8).start()
    try:
        ref = plain.submit(wav, language="en", return_timestamps=True)
        assert out["text"] == ref["text"]
        # the HTTP layer JSON-round-trips tuples into lists
        assert out["chunks"] == [
            {**c, "timestamp": list(c["timestamp"])}
            for c in ref.get("chunks", [])]
    finally:
        plain.stop()


@pytest.fixture(scope="module")
def spec_engine_server(tmp_path_factory):
    """The same teacher/draft pair served by the CONTINUOUS scheduler:
    the accept/verify loop runs per lane inside the engine step-blocks."""
    root = tmp_path_factory.mktemp("spec_engine")
    teacher_ck = make_tiny_checkpoint(root / "teacher", decoder_layers=2,
                                      seed=0)
    draft_ck = make_tiny_checkpoint(root / "draft", decoder_layers=1, seed=7)
    from distil_whisper_tpu.cli.run_server import build_server
    httpd, transcriber = build_server([
        "--model_checkpoint", teacher_ck,
        "--assistant_checkpoint", draft_ck, "--gamma", "3",
        "--host", "127.0.0.1", "--port", "0",
        "--scheduler", "continuous", "--block_steps", "4",
        "--batch_size", "2", "--max_new_tokens", "8", "--dtype", "float32",
        "--language", "en",
    ])
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", transcriber
    httpd.shutdown()
    transcriber.stop()


def test_engine_speculative_identity_over_http(spec_engine_server):
    """Continuous-scheduler speculative lanes == plain greedy over the same
    pipeline, and /v1/stats carries the live acceptance rate."""
    from distil_whisper_tpu.serving import BatchingTranscriber

    base, spec_tr = spec_engine_server
    plain = BatchingTranscriber(spec_tr.pipe, batch_size=2,
                                default_language="en",
                                max_new_tokens=8).start()
    try:
        for freq in (220.0, 341.0, 452.0):
            wav = _wav_bytes(freq=freq)
            status, out = _post(base + "/v1/transcribe?language=en", wav)
            assert status == 200
            ref = plain.submit(wav, language="en")
            assert out["text"] == ref["text"], f"freq={freq}"
    finally:
        plain.stop()
    assert spec_tr.stats["drafted"] > 0
    with urllib.request.urlopen(base + "/v1/stats", timeout=60) as r:
        snap = json.loads(r.read())
    assert snap["speculative"]["gamma"] == 3
    assert 0.0 <= snap["speculative"]["acceptance_rate"] <= 1.0
    # segment timestamps ride the speculative lanes (per-column FSM in the
    # verify pass — no pipeline fallback)
    status, out = _post(base + "/v1/transcribe?language=en&timestamps=1",
                        _wav_bytes(freq=260.0))
    assert status == 200
    assert "chunks" in out
    assert spec_tr.stats["ts_fallback"] == 0


def test_max_tokens_truncation_matches_prefix(spec_server):
    """Per-request max_tokens on the speculative path = truncation of the
    full-budget output (greedy prefix property holds through accept/verify)."""
    base, _ = spec_server
    wav = _wav_bytes(freq=233.0)
    _, full = _post(base + "/v1/transcribe?language=en", wav)
    _, short = _post(base + "/v1/transcribe?language=en&max_tokens=3", wav)
    assert full["text"].startswith(short["text"])


# ----------------------------------------------------------------------
# Prompt-lookup (n-gram) speculation over HTTP — no assistant checkpoint.
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def ngram_server(tmp_path_factory):
    root = tmp_path_factory.mktemp("ngram")
    ck = make_tiny_checkpoint(root / "teacher", decoder_layers=2, seed=3)
    from distil_whisper_tpu.cli.run_server import build_server
    httpd, transcriber = build_server([
        "--model_checkpoint", ck,
        "--ngram_speculative", "--gamma", "3", "--max_ngram", "2",
        "--host", "127.0.0.1", "--port", "0",
        "--batch_size", "2", "--max_wait_ms", "50",
        "--max_new_tokens", "10", "--dtype", "float32",
        "--language", "en",
    ])
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", transcriber
    httpd.shutdown()
    transcriber.stop()


def test_ngram_speculative_token_identity_over_http(ngram_server):
    """Draft-free prompt-lookup serving == plain greedy for the same
    inputs; the stats surface reports method=ngram."""
    from distil_whisper_tpu.serving import BatchingTranscriber

    base, spec_tr = ngram_server
    plain = BatchingTranscriber(spec_tr.pipe, batch_size=2,
                                default_language="en",
                                max_new_tokens=10).start()
    try:
        for freq in (220.0, 341.0, 452.0):
            wav = _wav_bytes(freq=freq)
            status, out = _post(base + "/v1/transcribe?language=en", wav)
            assert status == 200
            ref = plain.submit(wav, language="en")
            assert out["text"] == ref["text"], f"freq={freq}"
    finally:
        plain.stop()
    assert spec_tr.stats["speculative_batches"] >= 3
    with urllib.request.urlopen(base + "/v1/stats", timeout=60) as r:
        snap = json.loads(r.read())
    assert snap["speculative"]["method"] == "ngram"


def test_ngram_and_assistant_mutually_exclusive(tmp_path_factory):
    from distil_whisper_tpu.serving import BatchingTranscriber
    from distil_whisper_tpu.pipeline import WhisperPipeline
    ck = make_tiny_checkpoint(
        tmp_path_factory.mktemp("x") / "ck", decoder_layers=1, seed=5)
    import jax.numpy as jnp
    pipe = WhisperPipeline(ck, dtype=jnp.float32, batch_size=2,
                           max_new_tokens=4)
    with pytest.raises(ValueError):
        BatchingTranscriber(pipe, assistant=(pipe.params, pipe.cfg),
                            ngram_speculative=True)


def test_engine_long_form_windows_ride_spec_lanes(spec_engine_server):
    """A >30 s file on the speculative continuous engine: its strided
    windows ride the spec lanes (every lane speculates — the engine has no
    per-lane plain path) and the merged result equals the whole-file
    chunked pipeline output."""
    base, spec_tr = spec_engine_server
    before = spec_tr.stats["drafted"]
    wav = _wav_bytes(seconds=40.0, freq=225.0)
    status, out = _post(base + "/v1/transcribe?language=en&timestamps=1",
                        wav)
    assert status == 200
    assert spec_tr.stats["long_form"] >= 1
    assert spec_tr.stats["drafted"] > before  # windows speculated
    import io
    import wave as wave_mod
    with wave_mod.open(io.BytesIO(wav)) as w:
        frames = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    audio = (frames.astype(np.float32) / 32768.0)
    ref = spec_tr.pipe(audio, chunk_length_s=30.0, language="en",
                       return_timestamps=True, max_new_tokens=8)
    assert out["text"] == ref["text"]
