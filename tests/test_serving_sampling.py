"""Per-request sampling on the serving surface (temperature / top_k / seed).

The generation stack has always supported HF ``do_sample`` semantics
(generate.py `_select`); these tests pin the serving plumb: the whole-batch
scheduler groups sampled requests into shared device calls, the continuous
engine runs SAMPLED LANES in-flight next to greedy ones (per-lane
temperature/top-k/PRNG — greedy lanes must stay bit-identical), and the
speculative engine routes sampling to its fallback thread (the
accept/verify contract is argmax agreement).
"""

import threading

import numpy as np
import jax.numpy as jnp
import pytest

from helpers import make_tiny_checkpoint

from distil_whisper_tpu.serving import _coerce_sampling


def _tone(seconds, freq, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * 16000)) / 16000.0
    return (0.2 * np.sin(2 * np.pi * freq * t)
            + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)


# ----------------------------------------------------------------------
# validation contract (loud rejection, no silent greedy downgrade)
# ----------------------------------------------------------------------


def test_coerce_sampling_validation():
    assert _coerce_sampling(0.0, 0, 1, "chunked", False) == (0.0, 0)
    assert _coerce_sampling(0.7, 50, 1, "chunked", True) == (0.7, 50)
    with pytest.raises(ValueError, match="temperature must be"):
        _coerce_sampling(-1.0, 0, 1, "chunked", False)
    with pytest.raises(ValueError, match="top_k must be"):
        _coerce_sampling(0.7, -3, 1, "chunked", False)
    with pytest.raises(ValueError, match="top_k requires temperature"):
        _coerce_sampling(0.0, 50, 1, "chunked", False)
    with pytest.raises(ValueError, match="beam"):
        _coerce_sampling(0.7, 0, 2, "chunked", False)
    with pytest.raises(ValueError, match="sequential"):
        _coerce_sampling(0.7, 0, 1, "sequential", False)
    with pytest.raises(ValueError, match="word"):
        _coerce_sampling(0.7, 0, 1, "chunked", "word")


# ----------------------------------------------------------------------
# whole-batch scheduler
# ----------------------------------------------------------------------


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    ck = make_tiny_checkpoint(tmp_path_factory.mktemp("sampling") / "ck")
    from distil_whisper_tpu.pipeline import WhisperPipeline
    return WhisperPipeline(ck, dtype=jnp.float32, batch_size=2,
                           max_new_tokens=10)


def test_batching_sampled_requests(pipe):
    from distil_whisper_tpu.serving import BatchingTranscriber
    tr = BatchingTranscriber(pipe, batch_size=2, max_new_tokens=10).start()
    try:
        wav = _tone(1.0, 260.0, 0)
        a = tr.submit(wav, language="en", temperature=0.8, top_k=8,
                      seed=123, timeout=600)
        b = tr.submit(wav, language="en", temperature=0.8, top_k=8,
                      seed=123, timeout=600)
        assert a["text"] == b["text"], "same seed must reproduce"
        assert isinstance(a["text"], str)

        # temperature -> 0 collapses sampling onto argmax: must equal greedy
        greedy = tr.submit(wav, language="en", timeout=600)
        near = tr.submit(wav, language="en", temperature=1e-4, seed=7,
                         timeout=600)
        assert near["text"] == greedy["text"]
        assert tr.stats["sampled"] >= 3

        # invalid combinations raise (mapped to 400 by the HTTP layer)
        with pytest.raises(ValueError, match="beam"):
            tr.submit(wav, language="en", temperature=0.7, num_beams=2)
        with pytest.raises(ValueError, match="top_k requires"):
            tr.submit(wav, language="en", top_k=10)
        with pytest.raises(ValueError, match="single-window"):
            tr.submit(_tone(35.0, 220.0, 1), language="en", temperature=0.7)
    finally:
        tr.stop()


def test_batching_sampled_matches_direct_generate(pipe):
    """The served sampled output must be exactly the library's sampled
    generate with the same opts, padded batch, temperature and seed —
    serving adds batching, never different numerics."""
    import jax
    from distil_whisper_tpu.audio import compute_mel
    from distil_whisper_tpu.generation import GenerationOptions
    from distil_whisper_tpu.serving import BatchingTranscriber

    cfg, tok = pipe.cfg, pipe.tokenizer
    wav = _tone(1.0, 300.0, 2)
    tr = BatchingTranscriber(pipe, batch_size=2, max_new_tokens=10).start()
    try:
        served = tr.submit(wav, language="en", temperature=0.6, top_k=5,
                           seed=42, timeout=600)
    finally:
        tr.stop()

    # mirror _run_short_group's batch construction for a 1-request group
    bsz = max(-(-1 // pipe.n_data) * pipe.n_data, pipe.n_data)
    wavs = np.zeros((bsz, cfg.n_samples), np.float32)
    wavs[0, :len(wav)] = wav
    mels = compute_mel(jnp.asarray(wavs), cfg).astype(pipe.dtype)
    prompt = tok.prompt_ids(language="en", task="transcribe",
                            no_timestamps=True)
    prompts = jnp.asarray([prompt] * bsz, jnp.int32)
    opts = GenerationOptions.from_config(
        cfg, max_new_tokens=10, return_timestamps=False,
        no_speech_token_id=tok.no_speech, do_sample=True, top_k=5)
    fn = pipe._jitted_generate(opts, len(prompt))
    out = fn(pipe.params, pipe._put_batch(mels), prompts, 0.6,
             jax.random.PRNGKey(42))
    ids = np.asarray(out.sequences)[0][:np.asarray(out.seq_len)[0]].tolist()
    assert served["text"] == tok.decode(ids, skip_special_tokens=True)


# ----------------------------------------------------------------------
# continuous engine: sampled lanes in-flight next to greedy lanes
# ----------------------------------------------------------------------


def test_engine_sampled_lanes_mixed_with_greedy(pipe):
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    tr = ContinuousTranscriber(pipe, batch_size=2, max_new_tokens=10,
                               block_steps=3).start()
    try:
        wav_g = _tone(1.0, 220.0, 3)
        wav_s = _tone(1.3, 410.0, 4)
        results = {}

        def greedy():
            results["g"] = tr.submit(wav_g, language="en", timeout=600)

        def sampled():
            results["s"] = tr.submit(wav_s, language="en", temperature=0.9,
                                     top_k=8, seed=11, timeout=600)

        ths = [threading.Thread(target=greedy),
               threading.Thread(target=sampled)]
        for t in ths:
            t.start()
        for t in ths:
            t.join(timeout=600)

        # the greedy lane is unaffected by its sampling neighbour: it must
        # equal the whole-batch pipeline's output exactly
        expect = pipe(wav_g, language="en", max_new_tokens=10)["text"]
        assert results["g"]["text"] == expect

        # the sampled lane reproduces under its seed
        again = tr.submit(wav_s, language="en", temperature=0.9, top_k=8,
                          seed=11, timeout=600)
        assert again["text"] == results["s"]["text"]

        # temperature -> 0 collapses onto the greedy path per lane
        near = tr.submit(wav_g, language="en", temperature=1e-4, seed=9,
                         timeout=600)
        assert near["text"] == expect
        assert tr.stats["sampled"] >= 3

        with pytest.raises(ValueError, match="top_k_max"):
            tr.submit(wav_g, language="en", temperature=0.7,
                      top_k=tr.engine.k_max + 1)
    finally:
        tr.stop()


def test_engine_spec_routes_sampling_to_fallback(tmp_path_factory):
    """Under --assistant_checkpoint the lanes run accept/verify (argmax
    agreement) — sampled requests must still be served, via the fallback
    thread, deterministically under their seed."""
    root = tmp_path_factory.mktemp("spec_sampling")
    teacher_ck = make_tiny_checkpoint(root / "teacher", decoder_layers=2,
                                      seed=0)
    draft_ck = make_tiny_checkpoint(root / "draft", decoder_layers=1, seed=7)
    from distil_whisper_tpu.models import load_params
    from distil_whisper_tpu.pipeline import WhisperPipeline
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    d_params, d_cfg = load_params(draft_ck, dtype=jnp.float32)
    spipe = WhisperPipeline(teacher_ck, dtype=jnp.float32, batch_size=2,
                            max_new_tokens=8)
    tr = ContinuousTranscriber(spipe, batch_size=2, max_new_tokens=8,
                               block_steps=3,
                               assistant=(d_params, d_cfg), gamma=3).start()
    try:
        wav = _tone(1.0, 330.0, 5)
        a = tr.submit(wav, language="en", temperature=0.8, seed=21,
                      timeout=600)
        b = tr.submit(wav, language="en", temperature=0.8, seed=21,
                      timeout=600)
        assert a["text"] == b["text"]
        assert tr.stats["sampled_fallback"] == 2
        # greedy requests still ride the speculative lanes
        g = tr.submit(wav, language="en", timeout=600)
        assert g["text"] == spipe(wav, language="en",
                                  max_new_tokens=8)["text"]
        assert tr.stats["drafted"] > 0
    finally:
        tr.stop()
