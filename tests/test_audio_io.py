"""WAV parsing / resampling tests."""

import numpy as np
import pytest

from distil_whisper_tpu.audio.io import read_wav, write_wav, resample, load_audio


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    audio = (0.5 * np.sin(np.arange(16000) / 30.0)
             + 0.01 * rng.standard_normal(16000)).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, audio, 16000)
    back, rate = read_wav(path)
    assert rate == 16000
    np.testing.assert_allclose(back, audio, atol=1e-4)


def test_wav_matches_stdlib_wave(tmp_path):
    """Cross-check our parser against the stdlib wave module writer."""
    import wave
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2")
    path = str(tmp_path / "w.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        stereo = np.stack([pcm, pcm], axis=1).reshape(-1)
        w.writeframes(stereo.tobytes())
    back, rate = read_wav(path)
    assert rate == 22050
    assert len(back) == 8000  # stereo downmixed
    np.testing.assert_allclose(back, pcm.astype(np.float32) / 32768.0, atol=1e-6)


def test_resample_tone():
    """A pure tone resampled 44.1k -> 16k keeps its frequency."""
    sr0, sr1, f = 44100, 16000, 440.0
    t = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = resample(x, sr0, sr1)
    assert abs(len(y) - sr1) <= 2
    spec = np.abs(np.fft.rfft(y[:sr1]))
    peak = np.argmax(spec)
    assert abs(peak - f) <= 2


def test_load_audio_dict_resamples():
    x = np.ones(8000, np.float32)
    out = load_audio({"array": x, "sampling_rate": 8000}, 16000)
    assert abs(len(out) - 16000) <= 2
