"""Golden-numerics tests for the log-mel front-end.

Golden values come from HF ``WhisperFeatureExtractor`` (the numpy reference the
torch-STFT variant in the reference repo matches to 1e-5) constructed locally —
no network needed.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from distil_whisper_tpu.config import WhisperConfig, PRESETS
from distil_whisper_tpu.audio.mel import (
    log_mel_spectrogram, whisper_mel_filters, hann_window, pad_or_trim,
)


def _hf_extractor(n_mels):
    from transformers import WhisperFeatureExtractor
    return WhisperFeatureExtractor(feature_size=n_mels)


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    # 7.3 s of noise + tone mix: exercises padding and non-trivial spectrum.
    t = np.arange(int(7.3 * 16000)) / 16000.0
    x = 0.1 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.standard_normal(t.shape)
    return x.astype(np.float32)


def test_hann_window_matches_torch():
    import torch
    ours = hann_window(400)
    theirs = torch.hann_window(400).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_mel_filters_match_hf(n_mels):
    ext = _hf_extractor(n_mels)
    ours = whisper_mel_filters(n_mels)
    np.testing.assert_allclose(ours, ext.mel_filters, atol=2e-6)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_hf(audio, n_mels):
    ext = _hf_extractor(n_mels)
    golden = ext(audio, sampling_rate=16000, return_tensors="np",
                 padding="max_length").input_features[0]  # (n_mels, 3000)
    cfg = WhisperConfig(num_mel_bins=n_mels)
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(audio), cfg)[0])
    assert ours.shape == golden.shape == (n_mels, 3000)
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-4)


def test_log_mel_batched_per_sample_max(audio):
    """Batching must not couple samples through the dynamic-range clamp."""
    cfg = PRESETS["tiny"]
    quiet = (audio * 1e-3).astype(np.float32)
    batch = np.stack([np.pad(audio, (0, 480000 - len(audio))),
                      np.pad(quiet, (0, 480000 - len(quiet)))])
    together = np.asarray(log_mel_spectrogram(jnp.asarray(batch), cfg))
    solo0 = np.asarray(log_mel_spectrogram(jnp.asarray(batch[0]), cfg)[0])
    solo1 = np.asarray(log_mel_spectrogram(jnp.asarray(batch[1]), cfg)[0])
    np.testing.assert_allclose(together[0], solo0, atol=1e-4)
    np.testing.assert_allclose(together[1], solo1, atol=1e-4)


def test_pad_or_trim():
    x = jnp.ones((5, 100))
    assert pad_or_trim(x, 50).shape == (5, 50)
    y = pad_or_trim(x, 200)
    assert y.shape == (5, 200)
    assert float(y[:, 100:].sum()) == 0.0
