"""Multi-head attention ops.

Plain einsum formulation with fp32 softmax (the T5X ``float32_logits`` trick,
cf. reference layers.py:123-194): on TPU the matmuls ride the MXU in bf16 while
the numerically brittle softmax stays fp32.  XLA fuses the scale/bias/softmax
chain into the matmuls, so for Whisper's shapes (encoder 1500x1500, decoder
<=448) this is already near-roofline; a Pallas flash kernel for the encoder is
a drop-in replacement behind the same signature.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative mask fill that is bf16-safe


@functools.lru_cache()
def _flash_available() -> bool:
    """True when the Pallas TPU kernels (mel, encoder attention) can run."""
    return jax.default_backend() in ("tpu", "axon")


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        causal: bool = False,
        float32_logits: bool = True,
        dropout_rate: float = 0.0,
        dropout_rng: Optional[jax.Array] = None,
        return_probs: bool = False) -> jnp.ndarray:
    """Scaled dot-product attention (einsum formulation).

    q: [B, Tq, H, D]   k, v: [B, Tk, H, D]   mask: broadcastable to [B, H, Tq, Tk]
    (True = attend).  Returns [B, Tq, H, D] in q.dtype.

    This is the general path (training, cached decode, arbitrary masks); the
    encoder's full 1500x1500 self-attention uses the in-tree Pallas kernel
    instead (ops/encoder_attention.py).
    """
    dtype = q.dtype
    depth = q.shape[-1]
    scale = depth ** -0.5
    q = q * jnp.asarray(scale, q.dtype)
    # (Single-token decode does NOT come through here: the cached bf16 path
    # uses decode_attention below against merged-layout K/V.)
    # float32_logits=True (training / parity): fp32 logits via fp32 MXU
    # accumulation over the native-dtype inputs (for bf16 inputs this is
    # bit-identical to upcast-then-matmul at full bf16 MXU rate) and fp32
    # softmax.  float32_logits=False (inference fast path): logits and softmax
    # stay in the input dtype — for a bf16 model this halves the [B,H,Tq,Tk]
    # intermediate traffic (~23% encoder time on v5e); for fp32 inputs it is
    # unchanged-exact.
    acc_dtype = jnp.float32 if float32_logits else dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=acc_dtype)
    if causal and mask is None:
        mask = causal_mask(q.shape[1], k.shape[1], 0)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(acc_dtype), axis=-1).astype(dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate),
                          jnp.zeros_like(probs))
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(dtype)
    if return_probs:
        # fp32 probs [B, H, Tq, Tk] — used for cross-attention DTW alignment
        return out, jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return out


def decode_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     n_heads: int,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Single-token attention against MERGED-layout K/V.

    q [B, D], k/v [B, T, D] with D = n_heads * head_dim; mask [B or 1, T]
    (True = attend).  Returns [B, D] in q.dtype.

    Why merged: a [.., T, H, 64] tensor puts 64 lanes on the TPU's 128-lane
    tile — the physical buffer (and every HBM read of it) pays ~2x.  Storing
    K/V as [.., T, H*64] keeps full rows.  The per-head logits are computed
    WITHOUT reshaping k (which would re-materialise the padded layout):

      logits[b,t,h] = k[b,t,:] @ qblk[b,:,h]   with qblk block-diagonal
                      (qblk[b, h*hd+j, g] = q[b,h,j] * I[h,g])

    — one [T,D]x[D,H] MXU matmul whose k operand streams at native layout.
    The probs are expanded back to D lanes with a constant 0/1 [H, D] matrix
    (another tiny matmul) and multiplied elementwise into merged v, reduced
    over T with fp32 accumulation.  Exactly equal to the head-split
    formulation (same contractions, fp32 softmax); measured 2.6x faster
    per teacher decode step at bs16 on v5e (scripts/ablate_decode2.py).
    """
    b, t, d = k.shape
    hd = d // n_heads
    scale = jnp.asarray(hd ** -0.5, q.dtype)
    eye = jnp.eye(n_heads, dtype=q.dtype)
    qblk = ((q * scale).reshape(b, n_heads, hd, 1)
            * eye[:, None, :]).reshape(b, d, n_heads)
    logits = jax.lax.dot_general(k, qblk, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    if mask is not None:
        logits = jnp.where(mask[:, :, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=1).astype(q.dtype)
    expand = jnp.repeat(eye, hd, axis=1)               # [H, D] 0/1
    pe = jax.lax.dot_general(probs, expand, (((2,), (0,)), ((), ())))
    out = jnp.sum((pe * v).astype(jnp.float32), axis=1)
    return out.astype(q.dtype)


def decode_attention_multi(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           n_heads: int,
                           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Small-Tq attention against MERGED-layout K/V (the Tq>1 generalisation
    of :func:`decode_attention` — same block-diagonal trick, one extra query
    axis).

    **Documented NEGATIVE result — not wired into decode().**  At the
    speculative-verify shape (B=1, T=454, D=1280, S=6) this measured ~53
    us/layer vs ~44 for the head-split bf16 einsum it would replace
    (scripts/ablate_verify_attn.py): the S-times probs-expand traffic
    outweighs the merged-layout win that makes the S=1 trick 2.6x faster.
    A probs@v matmul variant (H-redundant [S*H, D] block + diagonal
    extract) did not beat the einsum either.  Kept unit-tested
    (tests/test_attention_ops.py) for the record.

    q [B, S, D], k/v [B, T, D] with D = n_heads * head_dim and S small
    (speculative verify windows, S = gamma+1 <= ~8); mask [B or 1, T, S]
    (True = attend).  Returns [B, S, D] in q.dtype.

    The S query positions are folded into the block-diagonal q operand —
    qblk[b, h*hd+j, s*H+h] = q[b,s,h,j] — so the logits for ALL S positions
    come from ONE [T,D]x[D,S*H] MXU matmul whose k operand streams at native
    merged 128-lane layout (a head-split einsum would re-materialise the
    whole cache at 64-lane minor, ~2x HBM bytes; see decode_attention).
    The probs->output step expands probs to D lanes with the constant 0/1
    [H, D] matrix and reduces over T against merged v; the [B, T, S, D]
    intermediate is fusion-only (never hits HBM).  Exactly the same
    contractions as the head-split formulation, fp32 softmax.
    """
    b, t, d = k.shape
    s = q.shape[1]
    hd = d // n_heads
    scale = jnp.asarray(hd ** -0.5, q.dtype)
    eye = jnp.eye(n_heads, dtype=q.dtype)
    # [B,S,H,hd,1] * [H,1,H] -> [B,S,H,hd,H]; transpose the query axis inward
    # so minor-dim pairs (h, hd) stay together: -> [B, H, hd, S, H] -> [B,D,S*H]
    qblk = ((q * scale).reshape(b, s, n_heads, hd, 1) * eye[:, None, :])
    qblk = qblk.transpose(0, 2, 3, 1, 4).reshape(b, d, s * n_heads)
    logits = jax.lax.dot_general(k, qblk, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    logits = logits.reshape(b, t, s, n_heads)
    if mask is not None:
        logits = jnp.where(mask[:, :, :, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=1).astype(q.dtype)   # [B,T,S,H]
    expand = jnp.repeat(eye, hd, axis=1)                     # [H, D] 0/1
    pe = jax.lax.dot_general(probs, expand, (((3,), (0,)), ((), ())))
    out = jnp.sum((pe * v[:, :, None, :]).astype(jnp.float32), axis=1)
    return out.astype(q.dtype)                               # [B, S, D]


def causal_mask(tq: int, tk: int, offset) -> jnp.ndarray:
    """Causal mask where query position i (global ``offset + i``) may attend
    to key positions <= offset + i.

    ``offset`` may be a scalar ([1, 1, tq, tk] result) or a per-sample [B]
    array ([B, 1, tq, tk] result) — the latter serves decode paths where each
    batch lane sits at its own cursor (continuous-batching serving)."""
    qpos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    off = jnp.asarray(offset)
    if off.ndim == 1:
        return (kpos[None] <= qpos[None] + off[:, None, None])[:, None]
    return (kpos <= qpos + off)[None, None]
