"""Token-timestamp (cross-attention DTW) parity vs HF torch generate."""

import numpy as np
import jax.numpy as jnp
import pytest

from distil_whisper_tpu.generation import GenerationOptions, encode_and_generate
from distil_whisper_tpu.generation.word_timestamps import (
    default_alignment_heads, dtw, extract_token_timestamps, median_filter,
    token_timestamps_from_weights, words_from_tokens)
from tests.test_generate import CFG, VOCAB, EOS, setup  # noqa: F401

ALIGN_HEADS = [[0, 0], [0, 2], [1, 1], [1, 3]]


def test_median_filter_matches_torch():
    import torch
    from transformers.models.whisper.generation_whisper import _median_filter
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 9, 31)).astype(np.float32)
    ours = median_filter(x, 7)
    theirs = _median_filter(torch.from_numpy(x), 7).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_dtw_matches_hf():
    from transformers.models.whisper.generation_whisper import (
        _dynamic_time_warping)
    rng = np.random.default_rng(1)
    for _ in range(5):
        m = rng.standard_normal((12, 40))
        ti, fi = dtw(m.copy())
        hti, hfi = _dynamic_time_warping(m.copy())
        np.testing.assert_array_equal(ti, hti)
        np.testing.assert_array_equal(fi, hfi)


def test_token_timestamps_parity_vs_hf(setup):  # noqa: F811
    """End-to-end: HF generate(return_token_timestamps=True) vs our greedy
    generate + teacher-forced cross-attention DTW — same per-token times."""
    import torch
    model, params, mel = setup
    max_new = 24

    gc = model.generation_config
    gc.begin_suppress_tokens = None
    gc.suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.no_timestamps_token_id = 400
    gc.max_initial_timestamp_index = 50
    gc.pad_token_id = 0
    gc.alignment_heads = ALIGN_HEADS
    with torch.no_grad():
        hf = model.generate(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.tensor([[3], [3]]),
            max_new_tokens=max_new, do_sample=False,
            return_timestamps=False, return_token_timestamps=True)
    hf_seq = hf["sequences"].numpy()
    hf_times = hf["token_timestamps"].numpy()

    opts = GenerationOptions(max_new_tokens=max_new,
                             max_initial_timestamp_index=50)
    prompt = jnp.asarray([[3], [3]], jnp.int32)
    out = encode_and_generate(params, CFG, jnp.asarray(mel), prompt, opts)
    seqs = np.asarray(out.sequences)
    lens = np.asarray(out.seq_len)

    from distil_whisper_tpu.models.whisper import encode
    enc = encode(params["encoder"], CFG, jnp.asarray(mel))
    ours = extract_token_timestamps(
        params, CFG, seqs, lens, num_input_ids=1,
        alignment_heads=[tuple(p) for p in ALIGN_HEADS], enc=enc)

    # HF's dict path strips the decoder prompt from sequences AND drops the
    # prompt's zero slot from token_timestamps: hf row i <-> generated token
    # i, so ours[1:] (prompt slot at 0) aligns with hf[0:].
    for b in range(2):
        n = int(lens[b])
        np.testing.assert_array_equal(seqs[b][1:n], hf_seq[b][:n - 1])
        np.testing.assert_allclose(ours[b][1:n], hf_times[b][:n - 1],
                                   atol=0.021)


def test_words_from_tokens_grouping():
    class FakeTok:
        eos = 300

        def decode(self, ids):
            return {5: " hello", 6: " wor", 7: "ld", 8: "!"}.get(ids[0], "")

    words = words_from_tokens(FakeTok(), [5, 6, 7, 8, 300],
                              np.asarray([0.0, 0.5, 0.7, 0.9, 1.0]),
                              time_offset=10.0)
    assert [w["word"] for w in words] == [" hello", " world!"]
    assert words[0]["start"] == 10.0
    assert words[1]["start"] == 10.5 and words[1]["end"] == 10.9


def test_pipeline_word_timestamps(tmp_path):
    """pipeline(return_timestamps='word'): chunked long-form produces a
    global word list with monotone, stride-deduplicated spans."""
    import jax.numpy as jnp
    from tests.helpers import make_tiny_checkpoint
    from distil_whisper_tpu.pipeline import WhisperPipeline

    ck = make_tiny_checkpoint(tmp_path / "ck")
    pipe = WhisperPipeline(ck, dtype=jnp.float32, batch_size=8,
                           max_new_tokens=12)
    t = np.arange(int(45.0 * 16000)) / 16000.0
    audio = (0.2 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    out = pipe(audio, chunk_length_s=30.0, return_timestamps="word",
               language="en")
    assert "chunks" in out
    for w in out["chunks"]:
        s, e = w["timestamp"]
        assert 0.0 <= s <= e <= 45.01
        assert isinstance(w["text"], str)
    starts = [w["timestamp"][0] for w in out["chunks"]]
    assert starts == sorted(starts)
    assert out["text"] == "".join(w["text"] for w in out["chunks"]).strip()


def test_pipeline_word_timestamps_with_beam(tmp_path):
    """word timestamps x beam (closes the former NotImplementedError): the
    alignment pass runs teacher-forced over the winning beam hypothesis and
    yields the same well-formed word spans contract as greedy."""
    import jax.numpy as jnp
    from tests.helpers import make_tiny_checkpoint
    from distil_whisper_tpu.pipeline import WhisperPipeline

    ck = make_tiny_checkpoint(tmp_path / "ck")
    pipe = WhisperPipeline(ck, dtype=jnp.float32, batch_size=8,
                           max_new_tokens=12)
    t = np.arange(int(40.0 * 16000)) / 16000.0
    audio = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    out = pipe(audio, chunk_length_s=30.0, return_timestamps="word",
               language="en", generate_kwargs={"num_beams": 2})
    assert "chunks" in out
    for w in out["chunks"]:
        s, e = w["timestamp"]
        assert 0.0 <= s <= e <= 40.01
        assert isinstance(w["text"], str)
    starts = [w["timestamp"][0] for w in out["chunks"]]
    assert starts == sorted(starts)
    assert out["text"] == "".join(w["text"] for w in out["chunks"]).strip()
