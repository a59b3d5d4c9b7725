"""Fused W8A8 MLP Pallas kernel: int8 fc1 -> gelu -> int8 fc2, one pass.

Why: the XLA int8 MLP (dense_int8 twice) wins only ~12% over bf16 even
though the pure int8 matmuls are 2.3x faster (scripts/ablate_int8_mlp.py:
185 -> 81 ms for the 32-layer scan) — the dynamic-quant machinery costs a
full HBM round-trip of the [B, T, ffn] gelu intermediate (bf16 write + two
reads for absmax+rescale + int8 write).  This kernel keeps that
intermediate entirely in VMEM:

  grid (row_blocks, ffn_chunks); per program:
    c == 0: quantize the x block per-row into VMEM scratch (int8 + scale)
    every c: h = (xq @ w1q[:, c]) * xs * w1s[c] + b1[c]     (int8 MXU)
             h = gelu_exact(h)                               (VPU, fp32)
             requantize h per (row, chunk)                   (VPU)
             acc += (hq @ w2q[c, :]) * hs * w2s              (int8 MXU)
    last c: out = acc + b2                                    (fp32 block)

Per-(row, chunk) activation scales are FINER than the per-row-full-ffn
scales of the unfused path, so accuracy is equal or better.  Weights are
quantized once at load time (ops/quant.py); x is fetched once per row
block (same block index across chunks -> no re-copy); the gelu
intermediate never touches HBM.

Inference-only (no VJP): the encoder int8 path is an opt-in inference
mode; training always runs the exact bf16/f32 path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """erf via Abramowitz–Stegun 7.1.26 (|err| <= 1.5e-7 — far below the
    int8 quantization noise).  Mosaic has no erf primitive; exp lowers."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    # 0.5 * x * (1 + erf(x / sqrt(2))) in fp32 (the model's exact-gelu
    # numerics policy, erf to 1.5e-7)
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _kernel(x_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref, w2s_ref, b2_ref,
            out_ref, xq_ref, xs_ref, acc_ref, *, n_chunks: int):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        x32 = x_ref[:, :].astype(jnp.float32)
        amax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
        scale = jnp.maximum(amax, 1e-12) / 127.0
        xq_ref[:, :] = jnp.clip(jnp.round(x32 / scale),
                                -127, 127).astype(jnp.int8)
        xs_ref[:, :] = scale
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    # fc1 chunk: [bm, D] int8 @ [D, Fc] int8 -> int32 -> fp32 rescale
    h = jax.lax.dot_general(xq_ref[:, :], w1q_ref[:, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    h = (h.astype(jnp.float32) * xs_ref[:, :] * w1s_ref[:, :]
         + b1_ref[:, :])
    h = _gelu_exact(h)

    # per-(row, chunk) requantize — finer than the unfused per-row scale
    amax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
    hs = jnp.maximum(amax, 1e-12) / 127.0
    hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)

    # fc2 partial: [bm, Fc] int8 @ [Fc, D] int8 -> int32 -> fp32
    y = jax.lax.dot_general(hq, w2q_ref[:, :], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    acc_ref[:, :] += y.astype(jnp.float32) * hs

    @pl.when(c == n_chunks - 1)
    def _done():
        out_ref[:, :] = (acc_ref[:, :] * w2s_ref[:, :]
                         + b2_ref[:, :]).astype(out_ref.dtype)


def _supported(m, d, f, block_m, chunk_f) -> bool:
    return (d % 128 == 0 and f % chunk_f == 0 and chunk_f % 128 == 0
            and m >= 1)


@functools.partial(jax.jit, static_argnames=("block_m", "chunk_f",
                                             "interpret"))
def fused_int8_mlp(fc1, fc2, x, block_m: int = 512, chunk_f: int = 512,
                   interpret: bool = False):
    """x [..., D] (bf16/f32), fc1/fc2 = int8 dense params
    ({kernel_q, kernel_scale, bias}) -> [..., D] in x.dtype.

    Rows are independent: leading dims are flattened and padded to a
    ``block_m`` multiple (pad rows compute garbage and are sliced off).
    """
    orig_shape = x.shape
    d = orig_shape[-1]
    f = fc1["kernel_q"].shape[-1]
    xm = x.reshape(-1, d)
    m = xm.shape[0]
    bm = min(block_m, max(32, m))
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        xm = jnp.pad(xm, ((0, m_pad - m), (0, 0)))
    n_chunks = f // chunk_f

    w1q = fc1["kernel_q"]
    w1s = fc1["kernel_scale"].reshape(1, f).astype(jnp.float32)
    b1 = fc1.get("bias", jnp.zeros((f,))).reshape(1, f).astype(jnp.float32)
    w2q = fc2["kernel_q"]
    w2s = fc2["kernel_scale"].reshape(1, d).astype(jnp.float32)
    b2 = fc2.get("bias", jnp.zeros((d,))).reshape(1, d).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks),
        grid=(m_pad // bm, n_chunks),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),          # x
            pl.BlockSpec((d, chunk_f), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),          # w1q
            pl.BlockSpec((1, chunk_f), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),          # w1s
            pl.BlockSpec((1, chunk_f), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),          # b1
            pl.BlockSpec((chunk_f, d), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),          # w2q
            pl.BlockSpec((1, d), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),          # w2s
            pl.BlockSpec((1, d), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),          # b2
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, c: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, d), jnp.int8),       # xq
            pltpu.VMEM((bm, 1), jnp.float32),    # xs
            pltpu.VMEM((bm, d), jnp.float32),    # acc
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * d * f,
            transcendentals=m_pad * f,
            bytes_accessed=(m_pad * d * (x.dtype.itemsize + x.dtype.itemsize)
                            + (m_pad // bm) * 2 * d * f)),
        interpret=interpret,
    )(xm, w1q, w1s, b1, w2q, w2s, b2)
    if m_pad != m:
        out = out[:m]
    return out.reshape(orig_shape)


def mlp_supported(fc1, x, block_m: int = 512, chunk_f: int = 512) -> bool:
    """Shape gate for the fused path (else callers use dense_int8).

    Requires >= 256 rows: below that (single-token decode steps) the work
    is weight-read bound and XLA's dense_int8 composition already streams
    the int8 weights at full rate — the fused kernel's VMEM blocking buys
    nothing and its tuning targets encoder-scale row counts.
    """
    if "kernel_q" not in fc1:
        return False
    d = x.shape[-1]
    f = fc1["kernel_q"].shape[-1]
    m = 1
    for s in x.shape[:-1]:
        m *= s
    return m >= 256 and _supported(m, d, f, block_m, chunk_f)
