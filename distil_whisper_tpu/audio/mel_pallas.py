"""Fused log-mel front-end as a single Pallas TPU kernel.

One kernel fuses framing -> windowed-DFT matmul -> power -> mel projection ->
log10, so neither the [3000, 400] frame matrix nor the [3000, 402] spectrum
ever touches HBM (the pure-JAX path in ``mel.py`` materialises both).  The
per-sample dynamic-range clamp and (x+4)/4 scaling are a cheap XLA epilogue
(they need a global max over the sample).

Framing trick: with hop 160, reshape the padded audio into 160-wide sub-blocks
[B, n_sub, 160]; frame i is ``concat(sub[i], sub[i+1], sub[i+2])[:400]``.
Three statically-shifted views of that array are passed as separate inputs so
each grid block is a plain BlockSpec slice (Mosaic supports neither in-kernel
1-D->2-D reshapes nor sublane-shifted lane concatenation, and overlapping
windows cannot be expressed as one BlockSpec).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import WhisperConfig
from .mel import stft_basis, whisper_mel_filters, pad_or_trim

FRAMES_PER_BLOCK = 200          # 3000 frames = 15 blocks; 200 % 8 == 0 (tiling)
_N_FFT = 400
_HOP = 160


def _mel_kernel(sub0_ref, sub1_ref, sub2_ref, basis_ref, filters_ref, out_ref):
    """grid (B, n_blocks); out block [1, FRAMES_PER_BLOCK, n_mels]."""
    frames = jnp.concatenate(
        [sub0_ref[0], sub1_ref[0], sub2_ref[0]], axis=1)[:, :_N_FFT]  # [F,400]
    spec = jnp.dot(frames, basis_ref[:].T,
                   preferred_element_type=jnp.float32)      # [F, 402]
    n_freq = _N_FFT // 2 + 1
    power = (spec[:, :n_freq] ** 2 + spec[:, n_freq:] ** 2)  # [F, 201]
    mel = jnp.dot(power, filters_ref[:],
                  preferred_element_type=jnp.float32)        # [F, n_mels]
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("num_mel_bins",))
def _mel_pallas_call(padded: jnp.ndarray, num_mel_bins: int) -> jnp.ndarray:
    b = padded.shape[0]
    n_frames = (padded.shape[1] - _N_FFT) // _HOP  # 3000 for 30 s
    assert n_frames % FRAMES_PER_BLOCK == 0, (
        f"fused mel needs frame count divisible by {FRAMES_PER_BLOCK}; "
        f"pad to the 30 s chunk or use mel.log_mel_spectrogram")
    n_blocks = n_frames // FRAMES_PER_BLOCK
    basis = jnp.asarray(stft_basis(_N_FFT))
    filters = jnp.asarray(whisper_mel_filters(num_mel_bins))

    # 160-wide sub-block views, shifted by 0/1/2 rows (frame i spans rows
    # i..i+2).  XLA materialises three cheap slices; everything downstream is
    # fused in the kernel.
    n_sub_total = -(-padded.shape[1] // _HOP)
    extra = n_sub_total * _HOP - padded.shape[1]
    if extra:
        padded = jnp.pad(padded, ((0, 0), (0, extra)))
    audio2d = padded.reshape(b, n_sub_total, _HOP)
    subs = [audio2d[:, s:s + n_frames] for s in range(3)]

    block = pl.BlockSpec((1, FRAMES_PER_BLOCK, _HOP),
                         lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    log_mel = pl.pallas_call(
        _mel_kernel,
        grid=(b, n_blocks),
        in_specs=[
            block, block, block,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # basis (402, 400)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # filters (201, n_mels)
        ],
        out_specs=pl.BlockSpec(
            (1, FRAMES_PER_BLOCK, num_mel_bins),
            lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_frames, num_mel_bins),
                                       jnp.float32),
    )(*subs, basis, filters)
    return log_mel


def log_mel_spectrogram_fused(audio: jnp.ndarray, cfg: WhisperConfig,
                              pad_to_chunk: bool = True) -> jnp.ndarray:
    """Drop-in replacement for ``mel.log_mel_spectrogram`` on TPU."""
    if audio.ndim == 1:
        audio = audio[None]
    if pad_to_chunk:
        audio = pad_or_trim(audio, cfg.n_samples)
    # torch.stft center=True reflect padding
    padded = jnp.pad(audio.astype(jnp.float32),
                     ((0, 0), (cfg.n_fft // 2, cfg.n_fft // 2)),
                     mode="reflect")
    log_spec = _mel_pallas_call(padded, cfg.num_mel_bins)  # [B, T, M]
    log_spec = log_spec.transpose(0, 2, 1)                 # [B, M, T]
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return (log_spec + 4.0) / 4.0
