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


def test_encoder_attention_kernel_matches_einsum():
    """In-tree Pallas kernel (fwd, incl. pad-tail key masking) vs the
    einsum reference, interpret mode."""
    from distil_whisper_tpu.ops.encoder_attention import (
        encoder_attention, _reference_attention)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 4, 256, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 4, 256, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 4, 256, 64)).astype(np.float32))
    for t_real in (256, 200):
        out = encoder_attention(q, k, v, t_real, block_q=128, exp_impl="f32",
                                interpret=True)
        ref = _reference_attention(q, k, v, t_real)
        np.testing.assert_allclose(np.asarray(out[:, :, :t_real]),
                                   np.asarray(ref[:, :, :t_real]),
                                   atol=2e-5, rtol=1e-4)


def test_encoder_attention_kernel_backward():
    """custom_vjp (einsum-recompute) gradients match autodiff through the
    reference formulation."""
    import jax
    from distil_whisper_tpu.ops.encoder_attention import (
        encoder_attention, _reference_attention)
    rng = np.random.default_rng(2)
    t_real = 100
    q = jnp.asarray(rng.standard_normal((1, 2, 128, 64)).astype(np.float32))
    k, v = q + 0.1, q - 0.1

    def loss_k(q, k, v):
        return jnp.sum(encoder_attention(q, k, v, t_real, 128, False, True)
                       [:, :, :t_real] ** 2)

    def loss_r(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, t_real)
                       [:, :, :t_real] ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_self_attention_matches_attention_block():
    """Layer-level fusion (projections straight into [B,H,T,D]) equals the
    standard attention_block bit-for-tolerance."""
    import jax
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.models.whisper import attention_block
    from distil_whisper_tpu.ops.encoder_attention import fused_self_attention

    cfg = PRESETS["test-tiny"]
    p = init_params(cfg, jax.random.PRNGKey(0))
    lp = jax.tree.map(lambda x: x[0], p["encoder"]["layers"])["self_attn"]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 256, 64)), jnp.float32)
    ref = attention_block(lp, x, x, 4)
    out = fused_self_attention(lp, x, 4, t_real=256, block_q=128,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_encode_fused_path_matches_einsum_path(monkeypatch):
    """Full encode() with the fused kernel path (forced on, interpret mode)
    equals the einsum path, incl. the pad-to-512/slice-back plumbing."""
    import jax
    import distil_whisper_tpu.models.whisper as W
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params

    cfg = PRESETS["test-tiny"]
    p = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    mel = jnp.asarray(rng.standard_normal((2, 80, 3000)), jnp.float32)
    ref = np.asarray(W.encode(p["encoder"], cfg, mel))
    monkeypatch.setattr(W, "_flash_available", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(W.encode(
            p["encoder"], cfg.replace(use_flash_encoder=True), mel))
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)
