import functools

import jax

from .mel import log_mel_spectrogram, mel_filter_bank, whisper_mel_filters, pad_or_trim  # noqa: F401
from .mel_pallas import log_mel_spectrogram_fused  # noqa: F401


@functools.lru_cache()
def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def compute_mel(audio, cfg, pad_to_chunk: bool = True):
    """Log-mel features via the fused Pallas kernel on TPU (bit-exact vs the
    XLA path, ~4x faster), falling back to pure JAX elsewhere."""
    if _on_tpu() and pad_to_chunk:
        return log_mel_spectrogram_fused(audio, cfg, pad_to_chunk=True)
    return log_mel_spectrogram(audio, cfg, pad_to_chunk=pad_to_chunk)
