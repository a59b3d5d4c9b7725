"""Log-mel spectrogram front-end, TPU-native.

Numerics pinned to the reference's torch-STFT feature extractor
(/root/reference/training/flax/distil_whisper/pipeline.py:40-58):

    stft       : n_fft=400, hop=160, hann(periodic) window, center=True (reflect pad)
    magnitudes : |stft[..., :-1]|**2            (last frame dropped -> 3000 frames)
    mel        : slaney-scale, slaney-norm filter bank (201 bins -> 80/128 mels)
    compress   : log10(clamp(., 1e-10)); max(., max-8); (.+4)/4   (max is per-sample)

Design: on TPU, an FFT of length 400 is *slower* than expressing the DFT as a
matmul — 3000x400 frames x 402 windowed cos/sin bases is ~0.5 GFLOP per 30 s
clip and rides the MXU.  We lower the whole STFT as a single strided
convolution with 2*201 output channels (XLA maps it onto the MXU), then fuse
power + mel projection + log compression.  A fully fused Pallas kernel lives in
``mel_pallas.py``; this module is the always-correct reference path and the
builder of the constant bases shared by both.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig

# ----------------------------------------------------------------------
# Constant builders (numpy, executed once at trace time)
# ----------------------------------------------------------------------


def hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window(n_fft)``."""
    n = np.arange(n_fft, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))).astype(np.float32)


def _hertz_to_mel_slaney(freq):
    """Slaney-style mel scale (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    return np.where(freq >= min_log_hertz,
                    min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hertz) * logstep,
                    mels)


def _mel_to_hertz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(mels >= min_log_mel,
                    1000.0 * np.exp(logstep * (mels - min_log_mel)),
                    freq)


def mel_filter_bank(num_frequency_bins: int, num_mel_filters: int,
                    min_frequency: float, max_frequency: float,
                    sampling_rate: int) -> np.ndarray:
    """Slaney-normalised triangular mel filter bank.

    Matches HF ``transformers.audio_utils.mel_filter_bank(norm='slaney',
    mel_scale='slaney')`` which is what ``WhisperFeatureExtractor`` uses.
    Returns ``(num_frequency_bins, num_mel_filters)`` float32.
    """
    fft_freqs = np.linspace(0.0, sampling_rate / 2.0, num_frequency_bins)
    mel_min = _hertz_to_mel_slaney(min_frequency)
    mel_max = _hertz_to_mel_slaney(max_frequency)
    mel_pts = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = _mel_to_hertz_slaney(mel_pts)

    filter_diff = np.diff(filter_freqs)
    slopes = np.expand_dims(filter_freqs, 0) - np.expand_dims(fft_freqs, 1)
    down_slopes = -slopes[:, :-2] / filter_diff[:-1]
    up_slopes = slopes[:, 2:] / filter_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    # Slaney energy normalisation.
    enorm = 2.0 / (filter_freqs[2: num_mel_filters + 2] - filter_freqs[:num_mel_filters])
    fb *= np.expand_dims(enorm, 0)
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def stft_basis(n_fft: int) -> np.ndarray:
    """Windowed DFT basis: ``(2*n_freq, n_fft)`` rows = [cos_k ; -sin_k] * hann.

    ``frames @ basis.T`` yields ``[re_0..re_200, im_0..im_200]`` per frame, so the
    power spectrum is ``re**2 + im**2``.
    """
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freq, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi * k * n[None, :] / n_fft
    win = hann_window(n_fft).astype(np.float64)
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=0) * win[None, :]
    return basis.astype(np.float32)


@functools.lru_cache(maxsize=8)
def whisper_mel_filters(num_mel_bins: int, n_fft: int = 400,
                        sampling_rate: int = 16000) -> np.ndarray:
    """The exact filter bank Whisper uses: 0..8 kHz, slaney/slaney. (201, n_mels)."""
    return mel_filter_bank(
        num_frequency_bins=1 + n_fft // 2,
        num_mel_filters=num_mel_bins,
        min_frequency=0.0,
        max_frequency=float(sampling_rate) / 2.0,
        sampling_rate=sampling_rate,
    )


# ----------------------------------------------------------------------
# JAX compute path
# ----------------------------------------------------------------------


def pad_or_trim(audio: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Zero-pad or truncate the trailing time axis to ``n_samples`` (static)."""
    t = audio.shape[-1]
    if t >= n_samples:
        return audio[..., :n_samples]
    pad = [(0, 0)] * (audio.ndim - 1) + [(0, n_samples - t)]
    return jnp.pad(audio, pad)


def _stft_power(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Power spectrogram via conv-as-DFT.  audio [B, T] -> [B, n_freq, n_frames].

    torch.stft(center=True) semantics: reflect-pad n_fft//2 on both sides; the
    reference drops the final frame (pipeline.py:50), so we only compute
    ``T // hop`` frames.
    """
    b, t = audio.shape
    n_freq = n_fft // 2 + 1
    n_frames = t // hop  # 3000 for 30 s; the +1'th (last) frame is dropped

    x = jnp.pad(audio, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    basis = jnp.asarray(stft_basis(n_fft))  # (2*n_freq, n_fft)

    # Overlapping frames via a static gather, then one MXU matmul against the
    # windowed DFT basis (faster to compile and run than a strided conv).
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[:, idx]  # [B, n_frames, n_fft]
    out = jnp.einsum("btf,cf->bct", frames, basis,
                     preferred_element_type=jnp.float32)
    re, im = out[:, :n_freq, :], out[:, n_freq:, :]
    return re * re + im * im


def log_mel_spectrogram(audio: jnp.ndarray, cfg: WhisperConfig,
                        pad_to_chunk: bool = True) -> jnp.ndarray:
    """Whisper log-mel features.  audio [T] or [B, T] -> [B, n_mels, 3000].

    Matches the reference extractor to ~1e-5 (tested against HF
    ``WhisperFeatureExtractor`` goldens in tests/test_mel.py).
    """
    if audio.ndim == 1:
        audio = audio[None]
    if pad_to_chunk:
        audio = pad_or_trim(audio, cfg.n_samples)
    power = _stft_power(audio.astype(jnp.float32), cfg.n_fft, cfg.hop_length)
    filters = jnp.asarray(whisper_mel_filters(cfg.num_mel_bins, cfg.n_fft,
                                              cfg.sampling_rate))  # (n_freq, n_mels)
    mel = jnp.einsum("fm,bft->bmt", filters, power,
                     preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    # Per-sample dynamic-range clamp (the reference extractor is called per
    # waveform, so the max is over each sample's full spectrogram).
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return (log_spec + 4.0) / 4.0
