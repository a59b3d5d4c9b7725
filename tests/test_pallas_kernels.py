"""Pallas kernel parity tests (CPU interpret mode; real-chip runs in bench)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from distil_whisper_tpu.config import WhisperConfig
from distil_whisper_tpu.audio.mel import log_mel_spectrogram
from distil_whisper_tpu.audio.mel_pallas import log_mel_spectrogram_fused
from distil_whisper_tpu.ops.attention import mha


@pytest.mark.parametrize("n_mels", [80, 128])
def test_fused_mel_matches_reference(n_mels):
    cfg = WhisperConfig(num_mel_bins=n_mels)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        0.2 * rng.standard_normal((2, cfg.n_samples)).astype(np.float32))
    golden = np.asarray(log_mel_spectrogram(audio, cfg))
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(log_mel_spectrogram_fused(audio, cfg))
    assert fused.shape == golden.shape == (2, n_mels, 3000)
    np.testing.assert_allclose(fused, golden, atol=2e-4, rtol=1e-4)


def test_flash_attention_matches_einsum():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 256, 4, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 256, 4, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 256, 4, 64)).astype(np.float32))
    golden = np.asarray(mha(q, k, v, use_flash=False))
    with pltpu.force_tpu_interpret_mode():
        flash = np.asarray(mha(q, k, v, use_flash=True))
    np.testing.assert_allclose(flash, golden, atol=2e-3, rtol=2e-3)


def test_flash_attention_causal_matches():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 128, 2, 64)).astype(np.float32))
    k, v = q + 0.1, q - 0.1
    golden = np.asarray(mha(q, k, v, causal=True, use_flash=False))
    with pltpu.force_tpu_interpret_mode():
        flash = np.asarray(mha(q, k, v, causal=True, use_flash=True))
    np.testing.assert_allclose(flash, golden, atol=2e-3, rtol=2e-3)
