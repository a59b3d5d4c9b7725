"""Sequential long-form parity vs HF's WhisperGenerationMixin on a >30 s
input: identical features in, identical segment boundaries and tokens out."""

import numpy as np
import pytest

from distil_whisper_tpu.config import WhisperConfig
from distil_whisper_tpu.models import load_params
from distil_whisper_tpu.generation.sequential import (
    SequentialOptions, SequentialTranscriber,
)
from tests.test_longform import _real_layout_tokenizer
from distil_whisper_tpu.tokenizer import WhisperTokenizer
from distil_whisper_tpu.tokenizer.bpe import ByteLevelBPE, bytes_to_unicode

VOCAB, EOS = 1902, 300
CFG = WhisperConfig(
    vocab_size=VOCAB, num_mel_bins=80, d_model=64,
    encoder_layers=2, decoder_layers=2,
    encoder_attention_heads=4, decoder_attention_heads=4,
    encoder_ffn_dim=96, decoder_ffn_dim=96,
    pad_token_id=0, bos_token_id=1, eos_token_id=EOS, decoder_start_token_id=3,
    begin_suppress_tokens=())


def _layout_tokenizer():
    """Tokenizer with the test vocab layout: notimestamps=400, ts_begin=401."""
    units = list(bytes_to_unicode().values())
    bpe = ByteLevelBPE({u: i for i, u in enumerate(units)}, [])
    added = {"<|endoftext|>": EOS, "<|startoftranscript|>": 3,
             "<|startofprev|>": 390, "<|nospeech|>": 399,
             "<|notimestamps|>": 400}
    return WhisperTokenizer(bpe, added)


def test_sequential_segments_match_hf():
    import torch
    from transformers import (WhisperConfig as HFConfig,
                              WhisperFeatureExtractor,
                              WhisperForConditionalGeneration)
    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=VOCAB, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=96, decoder_ffn_dim=96,
        dropout=0.0, pad_token_id=0, bos_token_id=1, eos_token_id=EOS,
        decoder_start_token_id=3, suppress_tokens=None,
        begin_suppress_tokens=None, forced_decoder_ids=None)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    gc = model.generation_config
    gc.no_timestamps_token_id = 400
    gc.max_initial_timestamp_index = 50
    gc.pad_token_id = 0
    gc.begin_suppress_tokens = None
    gc.suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.is_multilingual = False

    rng = np.random.default_rng(5)
    audio = (0.1 * rng.standard_normal(int(70 * 16000))).astype(np.float32)
    ext = WhisperFeatureExtractor(feature_size=80)
    feats = ext(audio, sampling_rate=16000, return_tensors="pt",
                padding="longest", truncation=False,
                return_attention_mask=True)
    with torch.no_grad():
        out = model.generate(
            input_features=feats.input_features,
            attention_mask=feats.attention_mask,
            return_timestamps=True, temperature=(0.0,),
            logprob_threshold=None, no_speech_threshold=None,
            compression_ratio_threshold=None,
            condition_on_prev_tokens=False, max_new_tokens=40,
            return_dict_in_generate=True, return_segments=True)
    hf_segments = [(round(float(s["start"]), 2), round(float(s["end"]), 2),
                    s["tokens"].tolist()) for s in out["segments"][0]]

    import tempfile
    d = tempfile.mkdtemp()
    model.save_pretrained(d)
    params, _ = load_params(d, CFG)
    tok = _layout_tokenizer()
    tr = SequentialTranscriber(
        params, CFG, tok,
        SequentialOptions(temperatures=(0.0,), logprob_threshold=None,
                          no_speech_threshold=None,
                          compression_ratio_threshold=None,
                          condition_on_prev_tokens=False,
                          max_new_tokens=40),
        language=None, batch_size=1)
    features = feats.input_features.numpy()[0]  # [80, 7000]
    results = tr.transcribe([features])
    ours = [(round(s["start"], 2), round(s["end"], 2), list(map(int, s["tokens"])))
            for s in results[0]["segments"]]

    assert len(ours) == len(hf_segments), (ours, hf_segments)
    for (os_, oe, ot), (hs, he, ht) in zip(ours, hf_segments):
        assert abs(os_ - hs) < 1e-6 and abs(oe - he) < 1e-6, (ours, hf_segments)
        assert ot == ht, (ot, ht)


@pytest.mark.parametrize("model_seed,audio_seed,dur_s",
                         [(8, 13, 50.0), (21, 2, 84.0)])
def test_sequential_segments_match_hf_multi_seed(model_seed, audio_seed,
                                                 dur_s):
    """Same token-identity check across fresh random models, audio seeds and
    durations — the window-advance/segment-split state machine is weight-
    dependent (where timestamps land decides every cursor move)."""
    import torch
    from transformers import (WhisperConfig as HFConfig,
                              WhisperFeatureExtractor,
                              WhisperForConditionalGeneration)
    torch.manual_seed(model_seed)
    hf_cfg = HFConfig(
        vocab_size=VOCAB, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=96, decoder_ffn_dim=96,
        dropout=0.0, pad_token_id=0, bos_token_id=1, eos_token_id=EOS,
        decoder_start_token_id=3, suppress_tokens=None,
        begin_suppress_tokens=None, forced_decoder_ids=None)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    gc = model.generation_config
    gc.no_timestamps_token_id = 400
    gc.max_initial_timestamp_index = 50
    gc.pad_token_id = 0
    gc.begin_suppress_tokens = None
    gc.suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.is_multilingual = False

    rng = np.random.default_rng(audio_seed)
    audio = (0.1 * rng.standard_normal(int(dur_s * 16000))
             ).astype(np.float32)
    ext = WhisperFeatureExtractor(feature_size=80)
    feats = ext(audio, sampling_rate=16000, return_tensors="pt",
                padding="longest", truncation=False,
                return_attention_mask=True)
    with torch.no_grad():
        out = model.generate(
            input_features=feats.input_features,
            attention_mask=feats.attention_mask,
            return_timestamps=True, temperature=(0.0,),
            logprob_threshold=None, no_speech_threshold=None,
            compression_ratio_threshold=None,
            condition_on_prev_tokens=False, max_new_tokens=40,
            return_dict_in_generate=True, return_segments=True)
    hf_segments = [(round(float(s["start"]), 2), round(float(s["end"]), 2),
                    s["tokens"].tolist()) for s in out["segments"][0]]

    import tempfile
    d = tempfile.mkdtemp()
    model.save_pretrained(d)
    params, _ = load_params(d, CFG)
    tr = SequentialTranscriber(
        params, CFG, _layout_tokenizer(),
        SequentialOptions(temperatures=(0.0,), logprob_threshold=None,
                          no_speech_threshold=None,
                          compression_ratio_threshold=None,
                          condition_on_prev_tokens=False,
                          max_new_tokens=40),
        language=None, batch_size=1)
    results = tr.transcribe([feats.input_features.numpy()[0]])
    ours = [(round(s["start"], 2), round(s["end"], 2),
             list(map(int, s["tokens"]))) for s in results[0]["segments"]]

    assert len(ours) == len(hf_segments), (ours, hf_segments)
    for (os_, oe, ot), (hs, he, ht) in zip(ours, hf_segments):
        assert abs(os_ - hs) < 1e-6 and abs(oe - he) < 1e-6, \
            (ours, hf_segments)
        assert ot == ht, (ot, ht)


def test_sequential_beam_matches_hf():
    """Beam search at the t=0 rung inside sequential long-form (the
    combination the reference supports by passing num_beams into HF
    generate, training/run_eval.py:690-718): identical segments vs HF."""
    import torch
    from transformers import (WhisperConfig as HFConfig,
                              WhisperFeatureExtractor,
                              WhisperForConditionalGeneration)
    torch.manual_seed(3)
    hf_cfg = HFConfig(
        vocab_size=VOCAB, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=96, decoder_ffn_dim=96,
        dropout=0.0, pad_token_id=0, bos_token_id=1, eos_token_id=EOS,
        decoder_start_token_id=3, suppress_tokens=None,
        begin_suppress_tokens=None, forced_decoder_ids=None)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    gc = model.generation_config
    gc.no_timestamps_token_id = 400
    gc.max_initial_timestamp_index = 50
    gc.pad_token_id = 0
    gc.begin_suppress_tokens = None
    gc.suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.is_multilingual = False

    rng = np.random.default_rng(11)
    audio = (0.1 * rng.standard_normal(int(62 * 16000))).astype(np.float32)
    ext = WhisperFeatureExtractor(feature_size=80)
    feats = ext(audio, sampling_rate=16000, return_tensors="pt",
                padding="longest", truncation=False,
                return_attention_mask=True)
    with torch.no_grad():
        out = model.generate(
            input_features=feats.input_features,
            attention_mask=feats.attention_mask,
            return_timestamps=True, temperature=(0.0,),
            num_beams=2,
            logprob_threshold=None, no_speech_threshold=None,
            compression_ratio_threshold=None,
            condition_on_prev_tokens=False, max_new_tokens=40,
            return_dict_in_generate=True, return_segments=True)
    hf_segments = [(round(float(s["start"]), 2), round(float(s["end"]), 2),
                    s["tokens"].tolist()) for s in out["segments"][0]]

    import tempfile
    d = tempfile.mkdtemp()
    model.save_pretrained(d)
    params, _ = load_params(d, CFG)
    tok = _layout_tokenizer()
    tr = SequentialTranscriber(
        params, CFG, tok,
        SequentialOptions(temperatures=(0.0,), logprob_threshold=None,
                          no_speech_threshold=None,
                          compression_ratio_threshold=None,
                          condition_on_prev_tokens=False,
                          max_new_tokens=40, num_beams=2),
        language=None, batch_size=1)
    features = feats.input_features.numpy()[0]
    results = tr.transcribe([features])
    ours = [(round(s["start"], 2), round(s["end"], 2),
             list(map(int, s["tokens"])))
            for s in results[0]["segments"]]

    assert len(ours) == len(hf_segments), (ours, hf_segments)
    for (os_, oe, ot), (hs, he, ht) in zip(ours, hf_segments):
        assert abs(os_ - hs) < 1e-6 and abs(oe - he) < 1e-6, (ours, hf_segments)
        assert ot == ht, (ot, ht)


def test_sequential_beam_fallback_ladder_runs():
    """Beam rung 0 + sampling fallback rungs coexist: force rung-0 rejection
    via an impossible logprob threshold and check the ladder still accepts
    at the last rung with segments produced."""
    import torch
    from transformers import (WhisperConfig as HFConfig,
                              WhisperForConditionalGeneration)
    torch.manual_seed(4)
    hf_cfg = HFConfig(
        vocab_size=VOCAB, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=96, decoder_ffn_dim=96,
        dropout=0.0, pad_token_id=0, bos_token_id=1, eos_token_id=EOS,
        decoder_start_token_id=3, suppress_tokens=None,
        begin_suppress_tokens=None, forced_decoder_ids=None)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    import tempfile
    d = tempfile.mkdtemp()
    model.save_pretrained(d)
    params, _ = load_params(d, CFG)
    tok = _layout_tokenizer()
    tr = SequentialTranscriber(
        params, CFG, tok,
        SequentialOptions(temperatures=(0.0, 1.0),
                          logprob_threshold=1e9,  # rung 0 always fails
                          no_speech_threshold=None,
                          compression_ratio_threshold=None,
                          condition_on_prev_tokens=True,
                          max_new_tokens=24, num_beams=2),
        language=None, batch_size=1)
    rng = np.random.default_rng(13)
    feats = rng.standard_normal((80, 4000)).astype(np.float32) * 0.3
    results = tr.transcribe([feats])
    segs = results[0]["segments"]
    assert segs, "fallback ladder produced no segments"
    # rung 0 (beam) is rejected by the impossible threshold; every accepted
    # segment must carry the last-rung temperature
    assert all(s["temperature"] == 1.0 for s in segs), segs


def test_sequential_condition_on_prev_matches_hf():
    import torch
    from transformers import (WhisperConfig as HFConfig,
                              WhisperFeatureExtractor,
                              WhisperForConditionalGeneration)
    torch.manual_seed(1)
    hf_cfg = HFConfig(
        vocab_size=VOCAB, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=96, decoder_ffn_dim=96,
        dropout=0.0, pad_token_id=0, bos_token_id=1, eos_token_id=EOS,
        decoder_start_token_id=3, suppress_tokens=None,
        begin_suppress_tokens=None, forced_decoder_ids=None)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    gc = model.generation_config
    gc.no_timestamps_token_id = 400
    gc.max_initial_timestamp_index = 50
    gc.pad_token_id = 0
    gc.begin_suppress_tokens = None
    gc.suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.is_multilingual = False
    gc.prev_sot_token_id = 390  # <|startofprev|>

    rng = np.random.default_rng(9)
    audio = (0.1 * rng.standard_normal(int(65 * 16000))).astype(np.float32)
    ext = WhisperFeatureExtractor(feature_size=80)
    feats = ext(audio, sampling_rate=16000, return_tensors="pt",
                padding="longest", truncation=False,
                return_attention_mask=True)
    with torch.no_grad():
        out = model.generate(
            input_features=feats.input_features,
            attention_mask=feats.attention_mask,
            return_timestamps=True, temperature=(0.0,),
            logprob_threshold=None, no_speech_threshold=None,
            compression_ratio_threshold=None,
            condition_on_prev_tokens=True, max_new_tokens=40,
            return_dict_in_generate=True, return_segments=True)
    hf_segments = [(round(float(s["start"]), 2), round(float(s["end"]), 2),
                    s["tokens"].tolist()) for s in out["segments"][0]]

    import tempfile
    d = tempfile.mkdtemp()
    model.save_pretrained(d)
    params, _ = load_params(d, CFG)
    tok = _layout_tokenizer()
    tr = SequentialTranscriber(
        params, CFG, tok,
        SequentialOptions(temperatures=(0.0,), logprob_threshold=None,
                          no_speech_threshold=None,
                          compression_ratio_threshold=None,
                          condition_on_prev_tokens=True,
                          max_new_tokens=40),
        language=None, batch_size=1)
    features = feats.input_features.numpy()[0]
    results = tr.transcribe([features])
    ours = [(round(s["start"], 2), round(s["end"], 2), list(map(int, s["tokens"])))
            for s in results[0]["segments"]]

    assert len(ours) == len(hf_segments), (ours, hf_segments)
    for (os_, oe, ot), (hs, he, ht) in zip(ours, hf_segments):
        assert abs(os_ - hs) < 1e-6 and abs(oe - he) < 1e-6, (ours, hf_segments)
        assert ot == ht, (ot, ht)
