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


# ----------------------------------------------------------------------
# compressed-container decode (decode_audio backends)
# ----------------------------------------------------------------------


def test_non_wav_without_decoder_names_codec(monkeypatch):
    """No soundfile, no ffmpeg: the error must name the sniffed container
    and the missing backends — not fail as 'not a RIFF/WAVE file'."""
    import shutil
    import pytest
    from distil_whisper_tpu.audio import io as aio

    monkeypatch.setattr(shutil, "which", lambda name: None)
    monkeypatch.setattr(aio, "_soundfile_read", lambda data: None)
    for magic, codec in ((b"fLaC" + b"\x00" * 64, "flac"),
                         (b"ID3" + b"\x00" * 64, "mp3"),
                         (b"OggS" + b"\x00" * 64, "ogg")):
        with pytest.raises(ValueError) as e:
            aio.decode_audio(magic)
        assert codec in str(e.value)
        assert "ffmpeg" in str(e.value)


def test_ffmpeg_subprocess_path(tmp_path, monkeypatch):
    """The ffmpeg plumbing end-to-end with a fake 'ffmpeg' on PATH that
    emits a known f32le ramp: stdin feed, arg order, f32 parse, and
    load_audio routing of non-WAV bytes through the subprocess."""
    import os
    import numpy as np
    from distil_whisper_tpu.audio import io as aio

    ramp = np.linspace(-1.0, 1.0, 1600).astype("<f4")
    raw = tmp_path / "ramp.f32"
    raw.write_bytes(ramp.tobytes())
    fake = tmp_path / "ffmpeg"
    # checks the reference invocation shape (pipeline.py:276) then emits
    # the ramp; consumes stdin so the feed pipe doesn't break
    fake.write_text(
        "#!/bin/sh\n"
        'echo "$@" | grep -q -- "-f f32le" || exit 2\n'
        'echo "$@" | grep -q -- "-ac 1" || exit 2\n'
        "cat > /dev/null\n"
        f"cat {raw}\n")
    fake.chmod(0o755)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}" + os.environ["PATH"])
    monkeypatch.setattr(aio, "_soundfile_read", lambda data: None)

    fake_mp3 = b"ID3" + b"\x00" * 128
    audio, rate = aio.decode_audio(fake_mp3, sampling_rate=16000)
    assert rate == 16000
    np.testing.assert_allclose(audio, ramp, rtol=0, atol=0)

    via_load = aio.load_audio(fake_mp3, 16000)
    np.testing.assert_allclose(via_load, ramp, rtol=0, atol=0)


def test_ffmpeg_error_is_reported(tmp_path, monkeypatch):
    """A decode failure surfaces ffmpeg's stderr, not a silent empty array."""
    import os
    import pytest
    from distil_whisper_tpu.audio import io as aio

    fake = tmp_path / "ffmpeg"
    fake.write_text("#!/bin/sh\ncat > /dev/null\necho 'bad stream' >&2\nexit 1\n")
    fake.chmod(0o755)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}" + os.environ["PATH"])
    monkeypatch.setattr(aio, "_soundfile_read", lambda data: None)
    with pytest.raises(ValueError) as e:
        aio.decode_audio(b"ID3" + b"\x00" * 32)
    assert "bad stream" in str(e.value)


def test_real_ffmpeg_mp3_roundtrip(tmp_path):
    """With a real ffmpeg (absent in this sandbox -> skipped): encode a tone
    to mp3, decode through load_audio, check the envelope survives."""
    import shutil
    import subprocess
    import numpy as np
    import pytest
    from distil_whisper_tpu.audio.io import load_audio, write_wav

    if shutil.which("ffmpeg") is None:
        pytest.skip("ffmpeg not available")
    t = np.arange(16000) / 16000.0
    tone = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    wav = tmp_path / "tone.wav"
    write_wav(str(wav), tone, 16000)
    mp3 = tmp_path / "tone.mp3"
    subprocess.run(["ffmpeg", "-y", "-i", str(wav), str(mp3)], check=True,
                   capture_output=True)
    decoded = load_audio(str(mp3), 16000)
    assert abs(len(decoded) - len(tone)) < 4000  # codec padding
    n = min(len(decoded), len(tone))
    corr = np.corrcoef(decoded[:n], tone[:n])[0, 1]
    assert corr > 0.8
