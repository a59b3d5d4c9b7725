"""distil_whisper_tpu — a TPU-native Whisper distillation + inference framework.

Brand-new JAX/XLA/Pallas implementation of the capability surface of
huggingface/distil-whisper: log-mel front-end, Whisper encoder-decoder with
static-shape KV caches, jitted generation (greedy/beam/sampling + timestamp
rules), chunked & sequential long-form transcription, speculative decoding, and
the four-stage distillation recipe (pseudo-label -> student init -> distill ->
eval) on a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from .config import WhisperConfig, PRESETS  # noqa: F401
