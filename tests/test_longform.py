"""Chunked pipeline + sequential long-form tests.

Chunk math is pinned to HF's ``chunk_iter``; segment cutting is pinned to HF's
``_retrieve_segment``; end-to-end runs use a tiny random model with the real
Whisper special-token id layout.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from distil_whisper_tpu.config import WhisperConfig
from distil_whisper_tpu.models import init_params
from distil_whisper_tpu.tokenizer import WhisperTokenizer
from distil_whisper_tpu.tokenizer.bpe import ByteLevelBPE, bytes_to_unicode
from distil_whisper_tpu.pipeline import WhisperPipeline
from distil_whisper_tpu.generation.sequential import (
    SequentialOptions, SequentialTranscriber,
)
from distil_whisper_tpu.audio.mel import log_mel_spectrogram

CFG = WhisperConfig(
    vocab_size=51865, num_mel_bins=80, d_model=64,
    encoder_layers=2, decoder_layers=2,
    encoder_attention_heads=4, decoder_attention_heads=4,
    encoder_ffn_dim=96, decoder_ffn_dim=96,
)


def _real_layout_tokenizer():
    """Tiny BPE but the *real* multilingual-v2 special-token id layout."""
    units = list(bytes_to_unicode().values())
    vocab = {u: i for i, u in enumerate(units)}
    bpe = ByteLevelBPE(vocab, [])
    added = {"<|endoftext|>": 50257, "<|startoftranscript|>": 50258,
             "<|en|>": 50259, "<|fr|>": 50265,
             "<|translate|>": 50358, "<|transcribe|>": 50359,
             "<|startoflm|>": 50360, "<|startofprev|>": 50361,
             "<|nospeech|>": 50362, "<|notimestamps|>": 50363}
    return WhisperTokenizer(bpe, added)


@pytest.fixture(scope="module")
def setup():
    params = init_params(CFG, jax.random.PRNGKey(0))
    tok = _real_layout_tokenizer()
    return params, tok


def test_chunk_math_matches_hf():
    """Our chunker == HF pipeline chunk_iter boundaries and strides."""
    from transformers.pipelines.audio_utils import ffmpeg_read  # noqa: F401
    from transformers.pipelines.automatic_speech_recognition import chunk_iter

    class _NoopFE:
        sampling_rate = 16000

        def __call__(self, audio, sampling_rate, return_tensors, **kw):
            import torch
            return {"input_features": torch.zeros((1, 80, 10))}

    sr = 16000
    audio = np.zeros(int(73.7 * sr), np.float32)
    chunk_s, stride_s = 30.0, 5.0
    golden = [dict(stride=c["stride"], is_last=c["is_last"])
              for c in chunk_iter(audio, _NoopFE(), int(chunk_s * sr),
                                  int(stride_s * sr), int(stride_s * sr))]

    pipe = WhisperPipeline.__new__(WhisperPipeline)
    pipe.cfg = CFG
    chunks = pipe._chunk(audio, chunk_s, stride_s)
    assert len(chunks) == len(golden)
    for ours, g in zip(chunks, golden):
        chunk_len, left, right = g["stride"]  # in samples
        np.testing.assert_allclose(
            ours["stride"], (chunk_len / sr, left / sr, right / sr))


def test_pipeline_end_to_end_long(setup):
    params, tok = setup
    pipe = WhisperPipeline.__new__(WhisperPipeline)
    pipe.params, pipe.cfg, pipe.tokenizer = params, CFG, tok
    pipe.dtype = jnp.float32
    pipe.batch_size = 4
    pipe.max_new_tokens = 16
    pipe._generate_cache = {}

    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(int(70.0 * 16000))).astype(np.float32)
    out = pipe(audio, chunk_length_s=30.0, language="en",
               return_timestamps=True)
    assert isinstance(out["text"], str)
    assert "chunks" in out
    starts = [c["timestamp"][0] for c in out["chunks"]
              if c["timestamp"][0] is not None]
    assert starts == sorted(starts)


def test_pipeline_short_form(setup):
    params, tok = setup
    pipe = WhisperPipeline.__new__(WhisperPipeline)
    pipe.params, pipe.cfg, pipe.tokenizer = params, CFG, tok
    pipe.dtype = jnp.float32
    pipe.batch_size = 2
    pipe.max_new_tokens = 12
    pipe._generate_cache = {}
    audio = np.zeros(16000 * 4, np.float32)
    out = pipe(audio, language="en")
    assert isinstance(out["text"], str)


def test_cut_segments_matches_hf(setup):
    """Segment slicing/advance parity vs HF _retrieve_segment."""
    import torch
    from transformers.models.whisper.generation_whisper import WhisperGenerationMixin

    params, tok = setup
    tr = SequentialTranscriber(params, CFG, tok, SequentialOptions(),
                               language="en", batch_size=2)
    tsb = tok.timestamp_begin

    cases = [
        # paired timestamps mid-stream + unfinished tail (advance to pair)
        [tsb + 0, 65, 66, tsb + 100, tsb + 100, 67, tsb + 120],
        # single trailing timestamp (full-window advance)
        [tsb + 0, 65, 66, tsb + 100],
        # no timestamps at all
        [65, 66, 67],
        # multiple complete segments
        [tsb + 0, 65, tsb + 50, tsb + 50, 66, tsb + 90, tsb + 90],
    ]
    for tokens in cases:
        seek_num_frames = 3000
        segments, advance = tr._cut_segments(tokens, 0.0, seek_num_frames)

        seek_sequence = torch.tensor(tokens)
        golden_segments, golden_idxs = WhisperGenerationMixin._retrieve_segment(
            seek_sequence=seek_sequence,
            seek_outputs=[{}],
            time_offset=torch.tensor([0.0]),
            timestamp_begin=tsb,
            seek_num_frames=torch.tensor([seek_num_frames]),
            time_precision=0.02,
            time_precision_features=0.01,
            input_stride=2,
            prev_idx=0,
            idx=0,
            return_token_timestamps=False,
            decoder_input_ids=torch.zeros((1, 1), dtype=torch.long),
        )
        if isinstance(golden_segments, dict):
            golden_segments = [golden_segments]
        assert len(segments) == len(golden_segments), tokens
        for ours, g in zip(segments, golden_segments):
            assert ours["tokens"] == list(g["tokens"].numpy()), tokens
            np.testing.assert_allclose(ours["start"], float(g["start"]), atol=1e-6)
            np.testing.assert_allclose(ours["end"], float(g["end"]), atol=1e-6)


def test_sequential_end_to_end(setup):
    params, tok = setup
    rng = np.random.default_rng(1)
    audio = (0.05 * rng.standard_normal(int(65.0 * 16000))).astype(np.float32)
    feats = np.asarray(log_mel_spectrogram(
        jnp.asarray(audio), CFG, pad_to_chunk=False)[0])
    tr = SequentialTranscriber(params, CFG, tok,
                               SequentialOptions(max_new_tokens=24,
                                                 temperatures=(0.0, 1.0)),
                               language="en", batch_size=2)
    results = tr.transcribe([feats, feats[:, :3500]])
    assert len(results) == 2
    for r in results:
        assert isinstance(r["text"], str)
        assert len(r["segments"]) >= 1
        for s in r["segments"]:
            assert s["end"] >= s["start"] >= 0.0


def test_sequential_condition_on_prev(setup):
    """condition_on_prev uses the fixed left-padded prompt layout and still
    produces valid segments (one compiled program for all context lengths)."""
    params, tok = setup
    rng = np.random.default_rng(2)
    audio = (0.05 * rng.standard_normal(int(62.0 * 16000))).astype(np.float32)
    feats = np.asarray(log_mel_spectrogram(
        jnp.asarray(audio), CFG, pad_to_chunk=False)[0])
    tr = SequentialTranscriber(
        params, CFG, tok,
        SequentialOptions(max_new_tokens=16, temperatures=(0.0,),
                          condition_on_prev_tokens=True),
        language="en", batch_size=1)
    results = tr.transcribe([feats])
    assert len(results[0]["segments"]) >= 1


def test_sequential_fallback_ladder_triggers(setup):
    """Force the quality gates to reject every candidate: the transcriber
    must walk the temperature ladder and keep the LAST temperature's result
    (the reference/HF contract — the final rung is accepted unconditionally),
    stamping segments with the temperature that produced them."""
    params, tok = setup
    rng = np.random.default_rng(3)
    audio = (0.05 * rng.standard_normal(int(40.0 * 16000))).astype(np.float32)
    feats = np.asarray(log_mel_spectrogram(
        jnp.asarray(audio), CFG, pad_to_chunk=False)[0])
    tr = SequentialTranscriber(
        params, CFG, tok,
        SequentialOptions(max_new_tokens=12, temperatures=(0.0, 0.5, 1.0),
                          compression_ratio_threshold=-1.0,  # ratio >= 0 always fails
                          logprob_threshold=None,
                          no_speech_threshold=None),
        language="en", batch_size=1)
    results = tr.transcribe([feats])
    segs = results[0]["segments"]
    assert segs
    # every kept segment came from the final rung of the ladder
    assert all(s["temperature"] == 1.0 for s in segs), \
        [s["temperature"] for s in segs]


# ----------------------------------------------------------------------
# Speculative decoding composed with long-form (VERDICT r4 items 1-2):
# the chunked pipeline and the sequential ladder's t=0 rung must produce
# BYTE-IDENTICAL output under speculation (draft or prompt-lookup),
# timestamps included — speculation is a pure speed knob.
# ----------------------------------------------------------------------

def _seg_key(s):
    return (round(s["start"], 4), round(s["end"], 4),
            [int(t) for t in s["tokens"]])


@pytest.fixture(scope="module")
def longform_audio():
    rng = np.random.default_rng(9)
    return (0.08 * rng.standard_normal(int(70.0 * 16000))).astype(np.float32)


def test_pipeline_speculative_ngram_identity(setup, longform_audio):
    from distil_whisper_tpu.parallel import make_mesh
    mesh1 = make_mesh(devices=jax.devices()[:1])
    common = dict(checkpoint=None, params=setup[0], cfg=CFG,
                  tokenizer=setup[1], dtype=jnp.float32, batch_size=2,
                  max_new_tokens=12, mesh=mesh1)
    plain = WhisperPipeline(**common)
    spec = WhisperPipeline(**common, speculative_method="ngram",
                           gamma=3, max_ngram=2)
    for ts in (False, True):
        a = plain(longform_audio, chunk_length_s=30.0, language="en",
                  return_timestamps=ts)
        b = spec(longform_audio, chunk_length_s=30.0, language="en",
                 return_timestamps=ts)
        assert a == b, (ts, a, b)
    # untrained models loop, so lookups fire on random weights
    assert spec.spec_stats["drafted"] > 0


def test_pipeline_speculative_draft_identity(setup, longform_audio):
    from distil_whisper_tpu.parallel import make_mesh
    from distil_whisper_tpu.training import init_student_from_teacher
    params, tok = setup
    draft, d_cfg = init_student_from_teacher(params, CFG, decoder_layers=1)
    mesh1 = make_mesh(devices=jax.devices()[:1])
    common = dict(checkpoint=None, params=params, cfg=CFG, tokenizer=tok,
                  dtype=jnp.float32, batch_size=2, max_new_tokens=12,
                  mesh=mesh1)
    plain = WhisperPipeline(**common)
    spec = WhisperPipeline(**common, speculative_method="draft",
                           assistant=(draft, d_cfg), gamma=3)
    a = plain(longform_audio, chunk_length_s=30.0, language="en",
              return_timestamps=True)
    b = spec(longform_audio, chunk_length_s=30.0, language="en",
             return_timestamps=True)
    assert a == b
    assert spec.spec_stats["drafted"] > 0


@pytest.mark.parametrize("method", ["ngram", "draft"])
def test_sequential_speculative_identity(setup, method):
    """Sequential long-form with condition_on_prev — the condition-on-prev
    prompt embeds the previous window's text verbatim, the prime n-gram
    source — must emit the same segments as the plain greedy ladder."""
    from distil_whisper_tpu.training import init_student_from_teacher
    params, tok = setup
    rng = np.random.default_rng(6)
    audio = (0.06 * rng.standard_normal(int(64.0 * 16000))).astype(np.float32)
    feats = np.asarray(log_mel_spectrogram(
        jnp.asarray(audio), CFG, pad_to_chunk=False)[0])
    opts = SequentialOptions(max_new_tokens=16, temperatures=(0.0,),
                             condition_on_prev_tokens=True)
    plain = SequentialTranscriber(params, CFG, tok, opts, language="en",
                                  batch_size=2)
    kw = {}
    if method == "draft":
        draft, d_cfg = init_student_from_teacher(params, CFG,
                                                 decoder_layers=1)
        kw["assistant"] = (draft, d_cfg)
    spec = SequentialTranscriber(params, CFG, tok, opts, language="en",
                                 batch_size=2, speculative_method=method,
                                 gamma=3, max_ngram=2, **kw)
    a = plain.transcribe([feats, feats[:, :4200]])
    b = spec.transcribe([feats, feats[:, :4200]])
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert [_seg_key(s) for s in ra["segments"]] == \
               [_seg_key(s) for s in rb["segments"]]
        assert ra["text"] == rb["text"]
        for sa, sb in zip(ra["segments"], rb["segments"]):
            # logprob accounting matches to float tolerance (different
            # matmul shapes between prefill and verify rounds)
            assert abs(sa["avg_logprob"] - sb["avg_logprob"]) < 2e-3
            assert abs(sa["no_speech_prob"] - sb["no_speech_prob"]) < 1e-5
    assert spec.spec_stats["rounds"] > 0


def test_sequential_speculative_ladder_falls_back_to_sampling(setup):
    """Fallback rungs (t>0) sample — they must run the plain sampling
    program (speculation is greedy-only) and still complete."""
    params, tok = setup
    rng = np.random.default_rng(7)
    audio = (0.05 * rng.standard_normal(int(40.0 * 16000))).astype(np.float32)
    feats = np.asarray(log_mel_spectrogram(
        jnp.asarray(audio), CFG, pad_to_chunk=False)[0])
    tr = SequentialTranscriber(
        params, CFG, tok,
        SequentialOptions(max_new_tokens=12, temperatures=(0.0, 1.0),
                          compression_ratio_threshold=-1.0,  # always fails
                          logprob_threshold=None, no_speech_threshold=None),
        language="en", batch_size=1, speculative_method="ngram")
    results = tr.transcribe([feats])
    segs = results[0]["segments"]
    assert segs and all(s["temperature"] == 1.0 for s in segs)


def test_speculative_config_validation(setup):
    params, tok = setup
    with pytest.raises(ValueError):
        SequentialTranscriber(params, CFG, tok, SequentialOptions(),
                              speculative_method="draft")  # no assistant
    with pytest.raises(ValueError):
        SequentialTranscriber(params, CFG, tok, SequentialOptions(),
                              speculative_method="ngram",
                              assistant=(params, CFG))
    with pytest.raises(ValueError):
        SequentialTranscriber(params, CFG, tok,
                              SequentialOptions(num_beams=2),
                              speculative_method="ngram")
    with pytest.raises(ValueError):
        WhisperPipeline(checkpoint=None, params=params, cfg=CFG,
                        tokenizer=tok, dtype=jnp.float32,
                        speculative_method="nope")
