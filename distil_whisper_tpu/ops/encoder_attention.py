"""Custom Pallas TPU kernel for Whisper encoder self-attention.

Whisper's encoder length is a compile-time constant (1500, padded to 1536),
small enough that a FULL score row fits in VMEM — so unlike generic flash
attention there is no need for online-softmax running max/sum renormalisation:
each program computes q_block @ K^T for the whole key range, one exact
softmax, then @ V.  Measured on v5e at (B16, H20, T1536, D64) inside the
32-layer scan: 215 ms vs 254 ms for XLA's fused einsum attention (and on par
with jax's generic flash kernel, with the advantage of CPU-interpret-mode
testability and an in-tree implementation to tune).

Layout: grid (B, H, T // block_q); per program q [block_q, D], K/V [T, D]
resident in VMEM (bf16, ~0.4 MB), scores [block_q, T] fp32 (~3 MB).
Key positions >= t_real (the pad tail) are masked with -inf; pad QUERY rows
compute garbage that the caller slices off (rows never mix).

Backward: einsum-recompute VJP (the kernel is inference-first; gradients for
unfrozen-encoder fine-tuning recompute attention with the reference einsum
formulation, which XLA handles well for bwd).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _poly_exp(x):
    """exp(x) for x <= 0 via range-reduced exp2 with a degree-4 polynomial.

    MEASURED SLOWER than jnp.exp on v5e (278 vs 215 ms for the 32-layer
    attention-only scan, scripts/bench_encoder_kernel.py) — Mosaic's f32 exp
    is already cheap; kept as a documented negative result / option for
    other TPU generations.  exp(x) = 2^n * exp(t) with n = round(x*log2e),
    t = x - n*ln2 in [-ln2/2, ln2/2]; exp(t) is a Taylor poly (max rel err
    ~5e-5, far below the bf16 rounding the probs see next), and 2^n is
    built by integer exponent-field assembly — no transcendental
    instruction anywhere.  Masked -inf columns are clamped to -80
    (exp ~ 1.8e-35, dead in the denominator).
    """
    x = jnp.maximum(x, -80.0)
    n = jnp.floor(x * 1.4426950408889634 + 0.5)
    t = x - n * 0.6931471805599453
    p = 1.0 + t * (1.0 + t * (0.5 + t * (0.16666667 + t * 0.041666668)))
    scale = jax.lax.bitcast_convert_type(
        (n.astype(jnp.int32) + 127) << 23, jnp.float32)
    return p * scale


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int, t_pad: int,
                 scale: float, exp_impl: str):
    q = q_ref[0, 0, :, :]                       # [bq, D] bf16
    k = k_ref[0, 0, :, :]                       # [T, D]
    v = v_ref[0, 0, :, :]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale                               # [bq, T] fp32
    if t_real < t_pad:
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols >= t_real, NEG_INF, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    if exp_impl == "bf16":
        # bf16 transcendental (measured NOT faster than f32 exp on v5e —
        # kept as an option; |rel err| ~ 4e-3 on (0, 1])
        p = jnp.exp((s - m).astype(jnp.bfloat16))
        denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    else:
        p = _poly_exp(s - m) if exp_impl == "poly" else jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = (pv / denom).astype(o_ref.dtype)


def _attention_fwd_impl(q, k, v, t_real: int, block_q: int, exp_impl: str,
                        interpret: bool):
    b, h, t, d = q.shape
    block_q = min(block_q, t)
    scale = d ** -0.5
    kernel = functools.partial(_attn_kernel, t_real=t_real, t_pad=t,
                               scale=scale, exp_impl=exp_impl)
    flops = 4 * b * h * t * t * d
    return pl.pallas_call(
        kernel,
        grid=(b, h, pl.cdiv(t, block_q)),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=b * h * t * t,
            bytes_accessed=(q.size + 2 * k.size + q.size) * q.dtype.itemsize),
        interpret=interpret,
    )(q, k, v)


def _reference_attention(q, k, v, t_real: int):
    """einsum formulation (fp32 softmax) — backward recompute path.
    q/k/v [B, H, T, D]."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * (d ** -0.5)
    if t_real < k.shape[2]:
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(cols >= t_real, NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def encoder_attention(q, k, v, t_real: int, block_q: int = 512,
                      exp_impl: str = "f32", interpret: bool = False):
    """Whisper encoder self-attention.

    q/k/v [B, H, T, D] with T block-padded — produce this layout directly
    from the projections (einsum "btd,dhk->bhtk", see fused_self_attention)
    rather than transposing [B,T,H,D] activations.  Keys >= t_real are
    masked.  Returns [B, H, T, D] in q.dtype."""
    return _attention_fwd_impl(q, k, v, t_real, block_q, exp_impl, interpret)


def fused_self_attention(p_attn, x_ln: jnp.ndarray, n_heads: int,
                         t_real: int, block_q: int = 512,
                         exp_impl: str = "f32",
                         interpret: bool = False,
                         fused_qkv: bool = False) -> jnp.ndarray:
    """Post-LN hidden states [B, T, d_model] -> self-attention block output
    [B, T, d_model] via the Pallas kernel, with q/k/v projected STRAIGHT into
    the kernel's [B, H, T, D] layout ("btd,dhk->bhtk") and the out-projection
    consuming it directly ("bhtk,hkd->btd") — zero layout copies.

    ``fused_qkv`` projects q/k/v with ONE [dm, 3*dm] matmul (reads x once
    instead of three times; the weight concat is a cheap one-off copy).
    MEASURED SLOWER on v5e (259 vs 215 ms for the attention-only scan) —
    XLA already amortises the activation reads across the three projection
    einsums; kept as a documented negative result."""
    b, t, dm = x_ln.shape
    d = dm // n_heads
    quantized = "kernel_q" in p_attn["q"]
    act_fq = "act_fq" in p_attn["q"]
    fused_qkv = fused_qkv and not (quantized or act_fq)
    if act_fq:
        # QAT w8a8 tree (ops/qat.py): fake-quant the shared q/k/v input the
        # way the int8 branch below quantizes it (ONE per-(b,t) scale),
        # straight-through gradient — keeps the flash-encoder training
        # forward on the serve-time numerics.
        from .qat import fake_quant_acts
        x_ln = fake_quant_acts(x_ln)
    if quantized:
        # W8A8 (ops/quant.py): ONE activation quantization shared by the
        # q/k/v projections; int8 x int8 -> int32 on the MXU, fp32 rescale.
        from .quant import quantize_acts
        xq, xs = quantize_acts(x_ln)
        xs4 = xs[:, None]                                  # [B, 1, T, 1]

    def proj(p):
        if quantized:
            wq = p["kernel_q"].reshape(dm, n_heads, d)
            ws = p["kernel_scale"].reshape(1, n_heads, 1, d)
            y = jnp.einsum("btd,dhk->bhtk", xq, wq,
                           preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * xs4 * ws
            if "bias" in p:
                y = y + p["bias"].reshape(n_heads, 1, d).astype(jnp.float32)
            return y.astype(x_ln.dtype)
        wk = p["kernel"].reshape(dm, n_heads, d).astype(x_ln.dtype)
        y = jnp.einsum("btd,dhk->bhtk", x_ln, wk,
                       preferred_element_type=jnp.float32).astype(x_ln.dtype)
        if "bias" in p:
            y = y + p["bias"].reshape(n_heads, 1, d).astype(y.dtype)
        return y

    if fused_qkv:
        wk = jnp.concatenate(
            [p_attn[n]["kernel"].reshape(dm, 1, n_heads, d)
             for n in ("q", "k", "v")], axis=1).astype(x_ln.dtype)
        y3 = jnp.einsum("btd,dshk->sbhtk", x_ln, wk,
                        preferred_element_type=jnp.float32).astype(x_ln.dtype)
        q, k, v = y3[0], y3[1], y3[2]
        q = q + p_attn["q"]["bias"].reshape(n_heads, 1, d).astype(q.dtype)
        if "bias" in p_attn["k"]:
            k = k + p_attn["k"]["bias"].reshape(n_heads, 1, d).astype(k.dtype)
        v = v + p_attn["v"]["bias"].reshape(n_heads, 1, d).astype(v.dtype)
    else:
        q = proj(p_attn["q"])
        k = proj(p_attn["k"])
        v = proj(p_attn["v"])
    a = encoder_attention(q, k, v, t_real, block_q, exp_impl, interpret)
    if quantized:
        # out-projection contracts over (h, k): per-(b, t) dynamic scale
        # reduced over both, int8 dot, fp32 rescale — no head-merge copy
        a32 = a.astype(jnp.float32)
        amax = jnp.max(jnp.abs(a32), axis=(1, 3), keepdims=True)  # [B,1,T,1]
        a_scale = jnp.maximum(amax, 1e-12) / 127.0
        aq = jnp.clip(jnp.round(a32 / a_scale), -127, 127).astype(jnp.int8)
        wo = p_attn["out"]["kernel_q"].reshape(n_heads, d, dm)
        y = jnp.einsum("bhtk,hkd->btd", aq, wo,
                       preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * a_scale[:, 0]
             * p_attn["out"]["kernel_scale"])
        return (y + p_attn["out"]["bias"].astype(jnp.float32)).astype(a.dtype)
    if act_fq:
        # mirror the int8 out-projection's per-(b,t)-over-(h,k) scale
        # (same element set as dense()'s per-row over the merged dm), STE
        from .qat import fake_quant_acts_axes
        a = fake_quant_acts_axes(a, (1, 3))
    wo = p_attn["out"]["kernel"].reshape(n_heads, d, dm).astype(a.dtype)
    y = jnp.einsum("bhtk,hkd->btd", a, wo,
                   preferred_element_type=jnp.float32).astype(a.dtype)
    return y + p_attn["out"]["bias"].astype(y.dtype)


def _fwd(q, k, v, t_real, block_q, exp_impl, interpret):
    out = _attention_fwd_impl(q, k, v, t_real, block_q, exp_impl, interpret)
    return out, (q, k, v)


def _bwd(t_real, block_q, exp_impl, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _reference_attention(q, k, v, t_real),
                     q, k, v)
    return vjp(g)


encoder_attention.defvjp(_fwd, _bwd)
