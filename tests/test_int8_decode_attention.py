"""Parity of the fused int8 decode-attention Pallas kernel (interpret mode)
against the dequantize-then-bf16 path it replaces
(ops.attention.decode_attention on dequantized K/V).

The kernel additionally quantizes q and the probs to int8 (per head), so
equality is bounded, not exact: tolerances here pin the drift at the level
of bf16 rounding (~1%% of output magnitude).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distil_whisper_tpu.ops.attention import decode_attention
from distil_whisper_tpu.ops.int8_decode_attention import int8_decode_attention

B, T, H, HD = 2, 64, 4, 32
D = H * HD


def _quant_per_head(x, rng):
    """[B, T, D] float -> int8 + per-(B, H) scale (the cross-KV format)."""
    xh = x.reshape(B, T, H, HD)
    amax = np.abs(xh).max(axis=(1, 3))
    scale = np.maximum(amax, 1e-8) / 127.0                     # [B, H]
    sv = np.repeat(scale, HD, axis=-1)[:, None]                # [B, 1, D]
    q = np.clip(np.round(x / sv), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32), (q.astype(np.float32) * sv)


def _quant_per_token(x):
    """[B, T, D] float -> int8 + per-(B, T) scale (the self-cache format)."""
    amax = np.abs(x).max(axis=-1)
    scale = np.maximum(amax, 1e-8) / 127.0                     # [B, T]
    q = np.clip(np.round(x / scale[..., None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32), (q.astype(np.float32)
                                         * scale[..., None])


def _ref(q, k_deq, v_deq, mask=None):
    return decode_attention(jnp.asarray(q, jnp.float32),
                            jnp.asarray(k_deq, jnp.float32),
                            jnp.asarray(v_deq, jnp.float32), H,
                            None if mask is None else jnp.asarray(mask))


@pytest.mark.parametrize("fmt", ["per_head", "per_token"])
def test_matches_dequant_path(fmt):
    rng = np.random.default_rng(0)
    q = (rng.standard_normal((B, D)) * 0.5).astype(np.float32)
    k = (rng.standard_normal((B, T, D)) * 0.7).astype(np.float32)
    v = (rng.standard_normal((B, T, D)) * 0.7).astype(np.float32)
    if fmt == "per_head":
        kq, ks, k_deq = _quant_per_head(k, rng)
        vq, vs, v_deq = _quant_per_head(v, rng)
    else:
        kq, ks, k_deq = _quant_per_token(k)
        vq, vs, v_deq = _quant_per_token(v)

    ref = np.asarray(_ref(q, k_deq, v_deq))
    got = np.asarray(int8_decode_attention(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(ks),
        jnp.asarray(vq), jnp.asarray(vs), H, interpret=True))
    # drift budget: q + probs int8 quantization, ~1% of |out|
    np.testing.assert_allclose(got, ref, atol=2e-2 * np.abs(ref).max())


def test_mask_rows_are_dead():
    """Masked key positions (cache tail / cross pad rows) must not leak:
    compare against the reference computed on the UNMASKED prefix only."""
    rng = np.random.default_rng(1)
    t_real = 40
    q = (rng.standard_normal((B, D)) * 0.5).astype(np.float32)
    k = (rng.standard_normal((B, T, D)) * 0.7).astype(np.float32)
    v = (rng.standard_normal((B, T, D)) * 0.7).astype(np.float32)
    # poison the tail: huge values there must be fully masked out
    k[:, t_real:] = 37.0
    v[:, t_real:] = -41.0
    kq, ks, k_deq = _quant_per_token(k)
    vq, vs, v_deq = _quant_per_token(v)
    mask = np.zeros((1, T), np.bool_)
    mask[:, :t_real] = True

    ref = np.asarray(_ref(q, k_deq[:, :t_real], v_deq[:, :t_real]))
    got = np.asarray(int8_decode_attention(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(ks),
        jnp.asarray(vq), jnp.asarray(vs), H, mask=jnp.asarray(mask),
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-2 * np.abs(ref).max())


def test_per_sample_mask():
    """[B, T] masks (per-sample left-pad) select per-sample rows."""
    rng = np.random.default_rng(2)
    q = (rng.standard_normal((B, D)) * 0.5).astype(np.float32)
    k = (rng.standard_normal((B, T, D)) * 0.7).astype(np.float32)
    v = (rng.standard_normal((B, T, D)) * 0.7).astype(np.float32)
    kq, ks, k_deq = _quant_per_token(k)
    vq, vs, v_deq = _quant_per_token(v)
    lens = [24, 56]
    mask = np.zeros((B, T), np.bool_)
    for i, n in enumerate(lens):
        mask[i, :n] = True

    got = np.asarray(int8_decode_attention(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(ks),
        jnp.asarray(vq), jnp.asarray(vs), H, mask=jnp.asarray(mask),
        interpret=True))
    for i, n in enumerate(lens):
        ref = np.asarray(_ref(q[i:i + 1], k_deq[i:i + 1, :n],
                              v_deq[i:i + 1, :n]))
        np.testing.assert_allclose(got[i:i + 1], ref,
                                   atol=2e-2 * np.abs(ref).max())


def test_bf16_inputs():
    """bf16 q (the production dtype) round-trips through the kernel."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, D)) * 0.5, jnp.bfloat16)
    k = (rng.standard_normal((B, T, D)) * 0.7).astype(np.float32)
    v = (rng.standard_normal((B, T, D)) * 0.7).astype(np.float32)
    kq, ks, k_deq = _quant_per_head(k, rng)
    vq, vs, v_deq = _quant_per_head(v, rng)
    got = int8_decode_attention(q, jnp.asarray(kq), jnp.asarray(ks),
                                jnp.asarray(vq), jnp.asarray(vs), H,
                                interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = np.asarray(_ref(np.asarray(q, np.float32), k_deq, v_deq))
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               atol=3e-2 * np.abs(ref).max())
