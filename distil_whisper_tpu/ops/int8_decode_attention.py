"""Fused single-token decode attention against int8 K/V — Pallas TPU kernel.

**Documented NEGATIVE result — kept unit-tested, NOT wired into decode().**
Measured at the teacher cross-KV shape (L32, bs16, T1500->1536, D1280) on
v5e: this kernel runs the 32-layer per-token attention at **5.3 ms/token
vs 4.3 for the XLA dequant + merged-layout path** it was meant to replace
(scripts/ablate_int8_decode_kernel.py).  The miss disproved the premise:
the production stream (3.28 ms/token in-model, scripts/ablate_cross_len.py)
moves its 2 GB of int8 bytes at ~610 GB/s — ~75% of spec HBM bandwidth —
so the XLA path is already bandwidth-optimal and the "~0.9 ms of unfused
overhead" inferred from the 820 GB/s paper roofline was headroom that does
not exist at sustainable bandwidth.  Lesson recorded in
docs/PERFORMANCE.md; the kernel remains as the reference int8-MXU decode
formulation (and the only one that makes int8 decode matmuls viable at
all — see below).

Why: the teacher's cached decode re-reads its whole quantized cross-KV
(32 x 2 x [B, 1500, 1280] int8, ~2 GB at bs16) every token.  The XLA path
dequantizes K/V to bf16 before the attention matmuls; this kernel keeps the
int8 bytes as the ONLY HBM traffic and does both matmuls on the int8 MXU
path.

The trick that makes int8 matmuls work here: XLA's int8 decode matmuls lose
badly at low M (scripts/ablate_decode_attn2.py: 16.7 ms vs 6.3 dequant), so
the kernel computes everything TRANSPOSED, with the key/value length as the
high dimension:

  scores^T [H, T] = dot(qblk8 [D, H] (contract D), Kq [T, D] (contract D))
      -- block-diagonal int8 q operand (the merged-layout trick of
         ops.attention.decode_attention, quantized per head), int8 x int8
         -> int32 on the MXU; per-(head) fp32 rescale folds the q scale,
         K scale and hd^-0.5 into a [H, 1] multiply.
  softmax over the minor (lane) axis -- the native reduction direction.
  probs quantized per head row (absmax -> int8, exact 127 at the peak).
  out^T [H, D] = dot(p8 [H, T], Vq [T, D]) -- int8 MXU again; the head-
      block diagonal is extracted with a constant 0/1 [H, D] mask and the
      p/V scales fold into a [H, 1] epilogue multiply.

K/V layouts are the serving layouts unchanged: merged [B, T, H*hd] int8.
Scale handling is static per call:
  * cross-KV: per-(batch, head) scales -> fold into sfac/vfac, krow/vrow=1
  * self-KV cache: per-(batch, token) scales -> krow/vrow [B, 1, T]
Masking (self-attention causality / left-pad, or cross pad rows) is an
int8 0/1 [B or 1, 1, T] input.

T must be a multiple of 32 (int8 sublane tile): the self cache (448) is;
quantized cross-KV pads 1500 -> 1536 when the kernel is enabled (the pad
rows are masked here and in the fallback einsum paths via ``t_mask``).

Numerics: q and probs ride int8 (the serving stack already quantizes
activations to int8 elsewhere — ops/quant.py); measured logit drift is
bounded by tests/test_int8_decode_attention.py against the dequant+bf16
reference path.  Inference-only (no VJP): generation never differentiates.

Reference role: the CUDA-side fused attention backends the reference
selects via flags (/root/reference/training/run_distillation.py:129-148);
here it is the TPU int8 serving path's attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qblk_ref, kq_ref, vq_ref, sfac_ref, vfac_ref, krow_ref,
            vrow_ref, mask_ref, expand_ref, o_ref):
    # [H, T] int32 scores: block-diag int8 q against merged int8 K
    s32 = jax.lax.dot_general(
        qblk_ref[0], kq_ref[0], (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    # mask is an ADDITIVE fp32 bias (0 = attend, -1e30 = masked): Mosaic has
    # no int8 vector compare, and an add needs no compare at all
    s = s32.astype(jnp.float32) * sfac_ref[0] * krow_ref[0] + mask_ref[0]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p = (p / denom) * vrow_ref[0]                       # [H, T] fp32
    ps = jnp.maximum(jnp.max(p, axis=1, keepdims=True), 1e-12) / 127.0
    p8 = jnp.round(p / ps).astype(jnp.int8)
    o32 = jax.lax.dot_general(p8, vq_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o = o32.astype(jnp.float32) * (ps * vfac_ref[0])    # [H, D]
    o = jnp.sum(o * expand_ref[...].astype(jnp.float32), axis=0,
                keepdims=True)
    o_ref[0, :, :] = o.astype(o_ref.dtype)


def _expand_eye(n_heads: int, d: int) -> jnp.ndarray:
    """0/1 [H, D] head-block selector (expand[h, h*hd:(h+1)*hd] = 1).
    bf16 (not int8): Mosaic lacks some int8 vector ops (e.g. compares)."""
    return jnp.repeat(jnp.eye(n_heads, dtype=jnp.bfloat16),
                      d // n_heads, axis=1)


def _quantize_q(q: jnp.ndarray, n_heads: int):
    """q [B, D] -> block-diag int8 [B, D, H] + per-head scale [B, H]."""
    b, d = q.shape
    hd = d // n_heads
    qh = q.astype(jnp.float32).reshape(b, n_heads, hd)
    qs = jnp.maximum(jnp.abs(qh).max(-1), 1e-12) / 127.0        # [B, H]
    q8 = jnp.clip(jnp.round(qh / qs[..., None]), -127, 127).astype(jnp.int8)
    eye = jnp.eye(n_heads, dtype=jnp.int8)
    qblk = (q8[..., None] * eye[:, None, :]).reshape(b, d, n_heads)
    return qblk, qs


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def int8_decode_attention(q, kq, k_scale, vq, v_scale, n_heads: int,
                          mask=None, interpret: bool = False):
    """Single-token attention against int8 merged-layout K/V.

    q [B, D] (any float dtype), kq/vq [B, T, D] int8 with T % 32 == 0.
    Scales: per-head [B, H] (cross-KV) or per-token [B, T] (self cache) —
    the two serving formats; kind is inferred from the shape.  mask
    [B or 1, T] (True/nonzero = attend) or None.  Returns [B, D] in q.dtype.
    """
    b, t, d = kq.shape
    hd = d // n_heads
    if t % 32:
        raise ValueError(f"key length {t} must be a multiple of 32 (int8 "
                         "sublane tile) — pad the K/V buffers and mask the "
                         "tail rows")
    if t == n_heads:
        raise ValueError(f"key length == n_heads ({t}): the per-head [B, H] "
                         "vs per-token [B, T] scale formats are ambiguous "
                         "at this shape")
    qblk, qs = _quantize_q(q, n_heads)

    def head_row(scale):
        if scale.shape[-1] == n_heads:                  # per-head [B, H]
            return scale.astype(jnp.float32), jnp.ones((b, 1, t), jnp.float32)
        if scale.shape[-1] != t:
            raise ValueError(f"scale shape {scale.shape} matches neither "
                             f"per-head [B, {n_heads}] nor per-token "
                             f"[B, {t}]")
        return (jnp.ones((b, n_heads), jnp.float32),
                scale.astype(jnp.float32)[:, None, :])

    k_head, k_row = head_row(k_scale)
    v_head, v_row = head_row(v_scale)
    sfac = (qs * k_head * (hd ** -0.5))[..., None]      # [B, H, 1]
    vfac = v_head[..., None]                            # [B, H, 1]

    if mask is None:
        bias = jnp.zeros((1, 1, t), jnp.float32)
    else:
        bias = jnp.where(mask != 0, 0.0, -1e30
                         ).astype(jnp.float32)[:, None, :]
    bm = bias.shape[0]
    expand = _expand_eye(n_heads, d)

    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, d, n_heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_heads, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_heads, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t),
                         (lambda i: (i, 0, 0)) if bm == b else
                         (lambda i: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_heads, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * t * d,
            transcendentals=b * n_heads * t,
            bytes_accessed=2 * b * t * d),
        interpret=interpret,
    )(qblk, kq, vq, sfac, vfac, k_row, v_row, bias, expand)
    return out[:, 0, :]
