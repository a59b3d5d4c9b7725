"""Continuous-batching serving engine: per-lane decode correctness +
token-identity of the engine against the whole-batch generate path.

The engine's claim is strong — lanes admitted and retired at different
times must decode EXACTLY the tokens the plain batch path produces — so the
tests drive real staggered traffic through the real worker thread.
"""

import threading
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import make_tiny_checkpoint

from distil_whisper_tpu.config import WhisperConfig
from distil_whisper_tpu.generation import logits as L


# ----------------------------------------------------------------------
# per-lane gen_idx in the logits rules == row-wise scalar application
# ----------------------------------------------------------------------


def test_logits_rules_per_lane_match_scalar():
    rng = np.random.default_rng(0)
    v = 1902  # timestamp_begin = 401, <|notimestamps|> = 400
    cfg = WhisperConfig(vocab_size=v, eos_token_id=300, d_model=8,
                        pad_token_id=0, bos_token_id=1,
                        decoder_start_token_id=3)
    scores = jnp.asarray(rng.standard_normal((4, v)).astype(np.float32))
    gen_idx = jnp.asarray([0, 1, 2, 7], jnp.int32)
    prompt_len = jnp.asarray([3, 4, 3, 2], jnp.int32)
    state = L.TimestampState(
        prev=jnp.asarray([-1, 405, 410, 55], jnp.int32),
        prevprev=jnp.asarray([-1, -1, 407, 402], jnp.int32),
        last_ts=jnp.asarray([0, 405, 410, 402], jnp.int32))

    forced = ((3, 17), (4, 23))
    begin = (9, 11)
    sup = (40, 41)

    def scalar_row(i):
        s = scores[i:i + 1]
        g = int(gen_idx[i])
        s = L.force_tokens(s, g, forced, int(prompt_len[i]))
        s = L.suppress_tokens_at_begin(s, g, begin)
        s = L.suppress_tokens(s, sup)
        s = L.min_new_tokens(s, g, 2, cfg.eos_token_id)
        st = L.TimestampState(prev=state.prev[i:i + 1],
                              prevprev=state.prevprev[i:i + 1],
                              last_ts=state.last_ts[i:i + 1])
        return L.timestamp_rules(s, g, st, cfg, 50)

    s = L.force_tokens(scores, gen_idx, forced, prompt_len)
    s = L.suppress_tokens_at_begin(s, gen_idx, begin)
    s = L.suppress_tokens(s, sup)
    s = L.min_new_tokens(s, gen_idx, 2, cfg.eos_token_id)
    batched = L.timestamp_rules(s, gen_idx, state, cfg, 50)

    ref = jnp.concatenate([scalar_row(i) for i in range(4)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


# ----------------------------------------------------------------------
# per-lane decode == scalar decode (uniform and staggered cursors)
# ----------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    ck = make_tiny_checkpoint(tmp_path_factory.mktemp("engine") / "ck")
    from distil_whisper_tpu.models import load_params
    params, cfg = load_params(ck)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((3, 80, 3000)).astype(np.float32)
                      * 0.5)
    return ck, params, cfg, mel


@pytest.mark.parametrize("quantize_self_kv", [False, True])
def test_per_lane_decode_matches_scalar(tiny, quantize_self_kv):
    from distil_whisper_tpu.models.whisper import (cross_kv, decode, encode,
                                                   init_cache)
    ck, params, cfg, mel = tiny
    cfg = cfg.replace(quantize_self_kv=quantize_self_kv)
    enc = encode(params["encoder"], cfg, mel)
    cross = cross_kv(params["decoder"], cfg, enc)
    prompt = jnp.asarray([[50258, 50259, 50359]] * 3, jnp.int32)

    # uniform per-lane cursor must equal the scalar path bit-for-bit
    tok = jnp.asarray([[5], [7], [9]], jnp.int32)
    outs = {}
    for name, pos in (("scalar", 3),
                      ("lanes", jnp.asarray([3, 3, 3], jnp.int32))):
        cache = init_cache(cfg, 3, max_len=16)
        _, cache = decode(params["decoder"], cfg, prompt, cross=cross,
                          cache=cache, pos_offset=0)
        lg, _ = decode(params["decoder"], cfg, tok, cross=cross, cache=cache,
                       pos_offset=pos)
        outs[name] = np.asarray(lg)
    np.testing.assert_array_equal(outs["scalar"], outs["lanes"])

    # staggered: drive 3 lanes to different depths (frozen lanes keep
    # re-decoding a pad at their cursor, engine-style), then compare each
    # lane's final logits against a solo batch-1 scalar-cursor run
    streams = [[5, 9, 11, 2], [7, 1], [4, 4, 4]]
    cache = init_cache(cfg, 3, max_len=16)
    _, cache = decode(params["decoder"], cfg, prompt, cross=cross,
                      cache=cache, pos_offset=0)
    pos = np.asarray([3, 3, 3], np.int32)
    finals = [None] * 3
    for step in range(max(len(s) for s in streams)):
        toks = [s[step] if step < len(s) else 0 for s in streams]
        lg, cache = decode(params["decoder"], cfg,
                           jnp.asarray(toks, jnp.int32)[:, None],
                           cross=cross, cache=cache,
                           pos_offset=jnp.asarray(pos))
        for b, s in enumerate(streams):
            if step < len(s):
                pos[b] += 1
                if step == len(s) - 1:
                    finals[b] = np.asarray(lg[b, -1])

    for b, s in enumerate(streams):
        sub = jax.tree.map(lambda x: x[:, b:b + 1], cross)
        cache1 = init_cache(cfg, 1, max_len=16)
        _, cache1 = decode(params["decoder"], cfg, prompt[b:b + 1],
                           cross=sub, cache=cache1, pos_offset=0)
        p = 3
        for t in s:
            lg1, cache1 = decode(params["decoder"], cfg,
                                 jnp.asarray([[t]], jnp.int32), cross=sub,
                                 cache=cache1, pos_offset=p)
            p += 1
        np.testing.assert_allclose(finals[b], np.asarray(lg1[0, -1]),
                                   rtol=2e-5, atol=2e-5)


# ----------------------------------------------------------------------
# engine vs whole-batch generate: token identity under staggered admission
# ----------------------------------------------------------------------


def _expected_text(pipe, wav, language, return_timestamps, max_new):
    out = pipe(wav, language=language, return_timestamps=return_timestamps,
               max_new_tokens=max_new)
    return out["text"]


@pytest.fixture(scope="module")
def engine_pipe(tiny):
    ck, params, cfg, mel = tiny
    from distil_whisper_tpu.pipeline import WhisperPipeline
    return WhisperPipeline(ck, dtype=jnp.float32, batch_size=2,
                           max_new_tokens=10, params=params, cfg=cfg)


def _tone(seconds, freq, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * 16000)) / 16000.0
    return (0.2 * np.sin(2 * np.pi * freq * t)
            + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)


def test_engine_matches_batch_path_staggered(engine_pipe):
    """8 requests through 2 lanes, staggered arrivals, mixed languages /
    timestamps / budgets: every text must equal the whole-batch pipeline's
    output for the same audio + options."""
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    pipe = engine_pipe
    tr = ContinuousTranscriber(pipe, batch_size=2, max_new_tokens=10,
                               block_steps=3).start()
    try:
        cases = []
        for i in range(8):
            cases.append(dict(
                wav=_tone(1.0 + 0.3 * (i % 3), 200.0 + 35 * i, seed=i),
                language=["en", "fr"][i % 2],
                return_timestamps=(i % 3 == 0),
                max_new=[10, 7, 5][i % 3]))

        results = [None] * len(cases)
        errors = []

        def post(i, c):
            try:
                results[i] = tr.submit(
                    c["wav"], language=c["language"],
                    return_timestamps=c["return_timestamps"],
                    max_new_tokens=c["max_new"], timeout=600)
            except Exception as e:  # noqa: BLE001
                errors.append((i, e))

        threads = []
        for i, c in enumerate(cases):
            th = threading.Thread(target=post, args=(i, c))
            th.start()
            threads.append(th)
            time.sleep(0.05 * (i % 4))  # staggered arrivals
        for th in threads:
            th.join(timeout=600)
        assert not errors, errors

        for i, c in enumerate(cases):
            expect = _expected_text(pipe, c["wav"], c["language"],
                                    c["return_timestamps"], c["max_new"])
            assert results[i]["text"] == expect, (
                f"case {i}: {results[i]['text']!r} != {expect!r}")
        # lanes were actually reused (8 requests through 2 lanes)
        assert tr.stats["admitted"] == 8
        assert tr.stats["max_inflight"] <= 2
    finally:
        tr.stop()


def test_engine_streaming_partials(engine_pipe):
    """submit_stream yields growing partials, then a final result equal to
    the non-streamed output."""
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    pipe = engine_pipe
    tr = ContinuousTranscriber(pipe, batch_size=2, max_new_tokens=10,
                               block_steps=2).start()
    try:
        wav = _tone(1.2, 260.0, seed=5)
        items = list(tr.submit_stream(wav, language="en", timeout=600))
        assert items[-1]["final"] is True
        assert all(not it["final"] for it in items[:-1])
        assert len(items) >= 2, "expected at least one partial"
        solo = tr.submit(wav, language="en", timeout=600)
        assert items[-1]["text"] == solo["text"]
    finally:
        tr.stop()


def test_engine_matches_batch_path_int8_kv(tiny):
    """Engine identity holds with the int8 self/cross-KV storage formats
    (quantized per-lane cache writes + quantized cross scatter)."""
    from distil_whisper_tpu.pipeline import WhisperPipeline
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    ck, params, cfg, mel = tiny
    cfg = cfg.replace(quantize_self_kv=True, quantize_cross_kv=True)
    pipe = WhisperPipeline(ck, dtype=jnp.float32, batch_size=2,
                           max_new_tokens=8, params=params, cfg=cfg)
    tr = ContinuousTranscriber(pipe, batch_size=2, max_new_tokens=8,
                               block_steps=3).start()
    try:
        wavs = [_tone(1.0, 210.0 + 40 * i, seed=10 + i) for i in range(4)]
        results = [None] * 4

        def post(i):
            results[i] = tr.submit(wavs[i], language="en", timeout=600)

        threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        for i, wav in enumerate(wavs):
            assert results[i]["text"] == _expected_text(pipe, wav, "en",
                                                        False, 8)
    finally:
        tr.stop()


def test_engine_matches_batch_path_under_tp(tiny, engine_pipe):
    """Engine identity holds when the served params are TENSOR-PARALLEL
    sharded (dp=2 x tp=4 mesh over the 8 virtual devices): the per-lane
    cache/cross state follows GSPMD propagation through decode, and every
    text equals the unsharded engine's/pipeline's output — the multi-chip
    serving configuration."""
    from distil_whisper_tpu.parallel import make_mesh
    from distil_whisper_tpu.pipeline import WhisperPipeline
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    ck, params, cfg, mel = tiny
    pipe = WhisperPipeline(ck, dtype=jnp.float32, batch_size=2,
                           max_new_tokens=8, params=params, cfg=cfg,
                           mesh=make_mesh((2, 4)))
    tr = ContinuousTranscriber(pipe, batch_size=2, max_new_tokens=8,
                               block_steps=3).start()
    try:
        wavs = [_tone(1.0, 215.0 + 45 * i, seed=20 + i) for i in range(4)]
        results = [None] * 4

        def post(i):
            results[i] = tr.submit(wavs[i], language="en", timeout=600)

        threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        for i, wav in enumerate(wavs):
            assert results[i]["text"] == _expected_text(
                engine_pipe, wav, "en", False, 8)
    finally:
        tr.stop()


def test_engine_long_form_in_lanes(engine_pipe):
    """A >30 s file is split into strided windows that ride the lanes; the
    merged result must equal the whole-file chunked pipeline, and a short
    request submitted while the long file decodes is not blocked by it."""
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    pipe = engine_pipe
    tr = ContinuousTranscriber(pipe, batch_size=2, max_new_tokens=10,
                               block_steps=3).start()
    try:
        wav = _tone(55.0, 220.0, seed=42)
        short = _tone(1.0, 300.0, seed=43)
        results = {}

        def run_long():
            results["long"] = tr.submit(wav, language="en",
                                        return_timestamps=True, timeout=600)

        def run_short():
            results["short"] = tr.submit(short, language="en", timeout=600)

        t1 = threading.Thread(target=run_long)
        t2 = threading.Thread(target=run_short)
        t1.start()
        time.sleep(0.2)
        t2.start()
        t1.join(timeout=600)
        t2.join(timeout=600)

        expect = pipe(wav, language="en", return_timestamps=True,
                      max_new_tokens=10)
        assert results["long"]["text"] == expect["text"]
        assert results["long"].get("chunks") == expect.get("chunks")
        assert results["short"]["text"] == _expected_text(
            pipe, short, "en", False, 10)
        assert tr.stats["long_form"] == 1
        assert tr.stats["admitted"] >= 3  # >=2 windows + 1 short request
    finally:
        tr.stop()


def test_engine_long_form_streaming(engine_pipe):
    """Streaming a long file yields chunk-prefix partials then the merged
    final result."""
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    pipe = engine_pipe
    tr = ContinuousTranscriber(pipe, batch_size=2, max_new_tokens=10,
                               block_steps=3).start()
    try:
        wav = _tone(55.0, 240.0, seed=44)
        items = list(tr.submit_stream(wav, language="en", timeout=600))
        assert items[-1]["final"] is True
        expect = pipe(wav, language="en", max_new_tokens=10)
        assert items[-1]["text"] == expect["text"]
        assert all(not it["final"] for it in items[:-1])
    finally:
        tr.stop()


def test_engine_http_server(tmp_path_factory, tiny):
    """--scheduler continuous serves the same HTTP surface."""
    import io
    import json
    import urllib.request
    import wave

    ck, *_ = tiny
    from distil_whisper_tpu.cli.run_server import build_server
    httpd, tr = build_server([
        "--model_checkpoint", ck, "--host", "127.0.0.1", "--port", "0",
        "--batch_size", "2", "--max_new_tokens", "6", "--dtype", "float32",
        "--language", "en", "--scheduler", "continuous",
        "--block_steps", "3"])
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        port = httpd.server_address[1]
        t = np.arange(16000) / 16000.0
        pcm = (0.2 * np.sin(2 * np.pi * 220.0 * t) * 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe?language=en",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.status == 200
            out = json.loads(r.read())
        assert "text" in out and isinstance(out["text"], str)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
            info = json.loads(r.read())
        assert info["status"] == "ok"

        # streaming: newline-delimited JSON partials, final line matches
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe?language=en&stream=1",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "application/x-ndjson"
            lines = [json.loads(x) for x in r.read().splitlines() if x]
        assert lines[-1]["final"] is True
        assert lines[-1]["text"] == out["text"]
        assert all(not x["final"] for x in lines[:-1])
    finally:
        httpd.shutdown()
        tr.stop()


# ----------------------------------------------------------------------
# backpressure, cancellation, lane reclaim
# ----------------------------------------------------------------------


def test_engine_backpressure_cancel_and_snapshot(engine_pipe):
    """Black-box serving hardening on the live engine: max_queue shedding,
    timeout cancellation (the pending copy is dropped, never admitted),
    and the /v1/stats snapshot fields."""
    from distil_whisper_tpu.serving import ServerOverloadedError
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    tr = ContinuousTranscriber(engine_pipe, batch_size=2, block_steps=2,
                               max_new_tokens=6, max_queue=0).start()
    try:
        with pytest.raises(ServerOverloadedError):
            tr.submit(_tone(1.0, 300.0, 0), language="en")
        assert tr.stats["rejected"] == 1

        tr.max_queue = 16
        with pytest.raises(TimeoutError):
            tr.submit(_tone(1.0, 300.0, 1), language="en", timeout=0.0)
        assert tr.stats["cancelled"] == 1

        # the engine keeps serving correctly after shed + cancelled traffic
        wav = _tone(1.0, 500.0, 2)
        out = tr.submit(wav, language="en", timeout=600)
        assert out["text"] == _expected_text(engine_pipe, wav, "en", False, 6)
        assert tr.stats["tokens_out"] > 0

        deadline = time.time() + 60
        while time.time() < deadline and tr.snapshot()["free_lanes"] != 2:
            time.sleep(0.05)
        snap = tr.snapshot()
        assert snap["scheduler"] == "continuous"
        assert snap["lanes"] == 2 and snap["free_lanes"] == 2
        assert snap["inflight"] == 0 and snap["pending_windows"] == 0
        assert snap["max_queue"] == 16
    finally:
        tr.stop()


def test_engine_reclaims_cancelled_inflight_lane(engine_pipe):
    """White-box pin of the reclaim invariant: cancelling a request whose
    lane is live (admitted, unfinished) frees the lane, and a new request
    admitted over the orphaned lane state decodes token-identically —
    admission scatters fresh values over every per-lane field."""
    from distil_whisper_tpu.serving_engine import (ContinuousTranscriber,
                                                   _EngineRequest)
    tr = ContinuousTranscriber(engine_pipe, batch_size=2, block_steps=2,
                               max_new_tokens=6)
    tr.engine.init_state()
    wavs = [_tone(1.0, f, s) for s, f in enumerate((260.0, 390.0, 520.0))]
    r1, r2, r3 = (_EngineRequest(w, "en", "transcribe", False, None,
                                 threading.Event()) for w in wavs)
    tr._pending += [r1, r2]
    tr._admit_pending()
    assert len(tr._inflight) == 2 and not tr._free
    lane1 = next(l for l, r in tr._inflight.items() if r is r1)

    # the lanes are live (admission prefilled cache/cross/FSM state and the
    # device decode would continue them): cancel r1 before any step so the
    # reclaim happens on a deterministically-unfinished lane
    tr._cancel(r1)
    tr._reclaim_cancelled()
    assert tr._free == [lane1] and list(tr._inflight.values()) == [r2]

    # admit r3 over the orphaned lane and run everything to completion
    tr._pending.append(r3)
    tr._admit_pending()
    assert tr._inflight[lane1] is r3
    deadline = time.time() + 120
    while not (r2.done.is_set() and r3.done.is_set()):
        assert time.time() < deadline, "engine did not finish"
        tr._complete((tr.engine.step(), dict(tr._inflight)))
    assert r2.result["text"] == _expected_text(engine_pipe, wavs[1], "en",
                                               False, 6)
    assert r3.result["text"] == _expected_text(engine_pipe, wavs[2], "en",
                                               False, 6)
    assert tr.stats["cancelled"] == 1


def test_engine_word_ts_burst_is_microbatched(engine_pipe):
    """A burst of word-timestamp requests must be served in SHARED device
    batches by the fallback thread (fb_max_batch > 1), each row identical
    to a direct single-audio pipeline call."""
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber

    tr = ContinuousTranscriber(engine_pipe, batch_size=2, block_steps=2,
                               max_new_tokens=6).start()
    try:
        wavs = [_tone(1.0, 260.0 + 40 * i, 10 + i) for i in range(4)]
        results = [None] * 4
        start_gate = threading.Event()

        def post(i):
            start_gate.wait()
            results[i] = tr.submit(wavs[i], language="en",
                                   return_timestamps="word", timeout=900)

        ts = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        start_gate.set()
        for t in ts:
            t.join(timeout=1200)
        for i in range(4):
            direct = engine_pipe(wavs[i], language="en",
                                 return_timestamps="word", max_new_tokens=6)
            assert results[i]["text"] == direct["text"], f"req {i}"
            assert results[i]["chunks"] == direct["chunks"], f"req {i}"
        assert tr.stats["word_ts"] == 4
        # the burst must not have been served strictly one-at-a-time
        assert tr.stats["fb_max_batch"] >= 2, tr.stats
    finally:
        tr.stop()


def test_engine_sequential_fallback(engine_pipe):
    """mode="sequential" on the continuous scheduler: the fallback thread
    runs the sliding-window transcriber, token-identical to a direct
    SequentialTranscriber, while lane traffic keeps flowing."""
    from distil_whisper_tpu.audio import compute_mel
    from distil_whisper_tpu.generation.sequential import (
        SequentialOptions, SequentialTranscriber)
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber

    tr = ContinuousTranscriber(engine_pipe, batch_size=2, block_steps=2,
                               max_new_tokens=6).start()
    try:
        wav_seq = _tone(33.0, 250.0, 5)
        wav_s = _tone(1.0, 440.0, 6)
        results = {}

        def seq():
            results["seq"] = tr.submit(wav_seq, language="en",
                                       mode="sequential", max_new_tokens=6,
                                       timeout=1200)

        def short():
            results["short"] = tr.submit(wav_s, language="en", timeout=600)

        ts = [threading.Thread(target=seq), threading.Thread(target=short)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=1800)

        pipe = engine_pipe
        direct_tr = SequentialTranscriber(
            pipe.params, pipe.cfg, pipe.tokenizer,
            SequentialOptions(max_new_tokens=6), language="en",
            task="transcribe", batch_size=1, dtype=pipe.dtype)
        feat = np.asarray(compute_mel(jnp.asarray(wav_seq), pipe.cfg,
                                      pad_to_chunk=False)[0])
        direct = direct_tr.transcribe([feat])[0]
        assert results["seq"]["text"] == direct["text"]
        assert [s["tokens"] for s in results["seq"]["segments"]] == \
            [[int(t) for t in s["tokens"]] for s in direct["segments"]]
        assert results["short"]["text"] == _expected_text(
            engine_pipe, wav_s, "en", False, 6)
        assert tr.stats["sequential"] == 1
    finally:
        tr.stop()


@pytest.fixture(scope="module")
def draft_assistant(tmp_path_factory):
    """Tiny 1-layer draft sharing the teacher's width (so the engine's
    admission shares encoder states — the distil-draft setup)."""
    ck = make_tiny_checkpoint(tmp_path_factory.mktemp("draft") / "ck",
                              decoder_layers=1, seed=7)
    from distil_whisper_tpu.models import load_params
    d_params, d_cfg = load_params(ck)
    return d_params, d_cfg


def test_engine_speculative_matches_greedy(engine_pipe, draft_assistant):
    """Per-lane speculative decoding: engine lanes with a draft assistant
    emit EXACTLY the greedy path's tokens (acceptance only changes how many
    verify rounds it takes), under staggered admission and mixed per-lane
    budgets; timestamp requests ride the fallback pipeline (the FSM cannot
    ride accept/verify lanes)."""
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    tr = ContinuousTranscriber(engine_pipe, batch_size=2, block_steps=4,
                               max_new_tokens=10,
                               assistant=draft_assistant, gamma=3).start()
    try:
        waves = [_tone(1.0, f, i)
                 for i, f in enumerate((270.0, 340.0, 410.0, 520.0))]
        budgets = [10, 5, 8, 10]
        results = {}

        def make(i):
            def run():
                results[i] = tr.submit(waves[i], language="en",
                                       max_new_tokens=budgets[i],
                                       timeout=600)
            return run

        threads = [threading.Thread(target=make(i)) for i in range(4)]
        for i, t in enumerate(threads):
            t.start()
            time.sleep(0.3 * i)  # staggered admission mid-decode
        for t in threads:
            t.join(timeout=900)
        for i in range(4):
            assert results[i]["text"] == _expected_text(
                engine_pipe, waves[i], "en", False, budgets[i]), i
        assert tr.stats["drafted"] > 0
        snap = tr.snapshot()
        assert snap["speculative"]["gamma"] == 3
        # timestamp requests RIDE the speculative lanes (per-column FSM in
        # the verify pass) — identical to the pipeline's timestamped greedy
        res_ts = tr.submit(waves[0], language="en", return_timestamps=True,
                           timeout=600)
        direct = engine_pipe(waves[0], language="en",
                             return_timestamps=True, max_new_tokens=10)
        assert res_ts["text"] == direct["text"]
        assert res_ts.get("chunks") == direct.get("chunks")
        assert tr.stats["ts_fallback"] == 0
    finally:
        tr.stop()


@pytest.mark.parametrize("accept,expect", [(1.0, 0.5), (0.0, -1.0)])
def test_engine_synthetic_acceptance_pins_rate(engine_pipe, draft_assistant,
                                               accept, expect):
    """BENCHMARK-ONLY oracle mode: with accept=1.0 every draft token is
    accepted (rate well above random-weight agreement); with accept=0.0
    none are.  Both models still run their real compute (the bias trick
    keeps the data dependence — the XLA DCE trap)."""
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    tr = ContinuousTranscriber(engine_pipe, batch_size=2, block_steps=4,
                               max_new_tokens=9,
                               assistant=draft_assistant, gamma=3,
                               synthetic_acceptance=accept).start()
    try:
        tr.submit(_tone(1.0, 290.0, 11), language="en", timeout=600)
        rate = tr.stats["accepted"] / max(tr.stats["drafted"], 1)
        if accept == 1.0:
            assert rate > expect, tr.stats
        else:
            assert tr.stats["accepted"] == 0, tr.stats
    finally:
        tr.stop()


def test_engine_beam_fallback(engine_pipe):
    """num_beams > 1 on the continuous scheduler: lanes are greedy-only, so
    beam requests ride the fallback thread with exact pipeline (batched beam
    program) semantics, while lane traffic keeps flowing concurrently."""
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    tr = ContinuousTranscriber(engine_pipe, batch_size=2, block_steps=2,
                               max_new_tokens=6).start()
    try:
        wav_b = _tone(1.0, 318.0, 3)
        wav_s = _tone(1.0, 440.0, 4)
        results = {}

        def beam():
            results["beam"] = tr.submit(wav_b, language="en", num_beams=2,
                                        timeout=600)

        def short():
            results["short"] = tr.submit(wav_s, language="en", timeout=600)

        ts = [threading.Thread(target=beam), threading.Thread(target=short)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=900)
        direct = engine_pipe(wav_b, language="en",
                             generate_kwargs={"num_beams": 2},
                             max_new_tokens=6)
        assert results["beam"]["text"] == direct["text"]
        assert results["short"]["text"] == _expected_text(
            engine_pipe, wav_s, "en", False, 6)
        assert tr.stats["beam"] == 1
        assert tr.snapshot()["fallback_depth"] == 0
    finally:
        tr.stop()


def test_engine_word_timestamps_fallback(engine_pipe):
    """return_timestamps="word" on the continuous scheduler: served by the
    fallback thread with exact pipeline semantics, while lane traffic keeps
    flowing concurrently."""
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    tr = ContinuousTranscriber(engine_pipe, batch_size=2, block_steps=2,
                               max_new_tokens=6).start()
    try:
        wav_w = _tone(1.0, 330.0, 3)
        wav_s = _tone(1.0, 440.0, 4)
        results = {}

        def word():
            results["word"] = tr.submit(wav_w, language="en",
                                        return_timestamps="word",
                                        timeout=600)

        def short():
            results["short"] = tr.submit(wav_s, language="en", timeout=600)

        ts = [threading.Thread(target=word), threading.Thread(target=short)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=900)
        direct = engine_pipe(wav_w, language="en", return_timestamps="word",
                             max_new_tokens=6)
        assert results["word"]["text"] == direct["text"]
        assert results["word"]["chunks"] == direct["chunks"]
        assert results["short"]["text"] == _expected_text(
            engine_pipe, wav_s, "en", False, 6)
        assert tr.stats["word_ts"] == 1
        assert tr.snapshot()["fallback_depth"] == 0
    finally:
        tr.stop()


def test_engine_inline_admission_knob(engine_pipe, monkeypatch):
    """DWT_INLINE_ADMISSION=1 (the A/B knob for measuring the admission-
    overlap win) featurises on the step-loop thread and must be output-
    identical to the default producer-thread path."""
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    monkeypatch.setenv("DWT_INLINE_ADMISSION", "1")
    tr = ContinuousTranscriber(engine_pipe, batch_size=2, max_new_tokens=8,
                               block_steps=2).start()
    try:
        assert tr._inline_admission
        wavs = [_tone(1.0, 220.0 + 40 * i, seed=10 + i) for i in range(3)]
        results = [None] * 3

        def post(i):
            results[i] = tr.submit(wavs[i], language="en", timeout=600)

        ts = [threading.Thread(target=post, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=600)
        for i in range(3):
            assert results[i]["text"] == _expected_text(
                engine_pipe, wavs[i], "en", False, 8)
    finally:
        tr.stop()


def test_engine_ngram_speculative_matches_greedy(engine_pipe):
    """Per-lane prompt-lookup (n-gram) speculation — NO draft model: engine
    lanes must emit exactly the greedy path's tokens under staggered
    admission and mixed budgets; /v1/stats reports method=ngram."""
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    tr = ContinuousTranscriber(engine_pipe, batch_size=2, block_steps=4,
                               max_new_tokens=10,
                               ngram_speculative=True, gamma=3,
                               max_ngram=2).start()
    try:
        waves = [_tone(1.0, f, 20 + i)
                 for i, f in enumerate((250.0, 335.0, 415.0, 505.0))]
        budgets = [10, 5, 8, 10]
        results = {}

        def make(i):
            def run():
                results[i] = tr.submit(waves[i], language="en",
                                       max_new_tokens=budgets[i],
                                       timeout=600)
            return run

        threads = [threading.Thread(target=make(i)) for i in range(4)]
        for i, t in enumerate(threads):
            t.start()
            time.sleep(0.3 * i)  # staggered admission mid-decode
        for t in threads:
            t.join(timeout=900)
        for i in range(4):
            assert results[i]["text"] == _expected_text(
                engine_pipe, waves[i], "en", False, budgets[i]), i
        snap = tr.snapshot()
        assert snap["speculative"]["method"] == "ngram"
        assert snap["speculative"]["gamma"] == 3
    finally:
        tr.stop()


def test_engine_ngram_periodic_oracle_accepts(engine_pipe):
    """synthetic_period (BENCHMARK-ONLY): a period-R teacher makes each
    lane's text repeat, so lookups succeed and acceptance goes positive —
    the measurable ceiling for the draft-free mode."""
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    tr = ContinuousTranscriber(engine_pipe, batch_size=2, block_steps=4,
                               max_new_tokens=24,
                               ngram_speculative=True, gamma=3, max_ngram=2,
                               synthetic_period=6).start()
    try:
        tr.submit(_tone(1.0, 290.0, 31), language="en", timeout=600)
        assert tr.stats["drafted"] > 0
        assert tr.stats["accepted"] > 0, tr.stats
    finally:
        tr.stop()
