"""Multi-head attention ops.

Plain einsum formulation with fp32 softmax (the T5X ``float32_logits`` trick,
cf. reference layers.py:123-194): on TPU the matmuls ride the MXU in bf16 while
the numerically brittle softmax stays fp32.  XLA fuses the scale/bias/softmax
chain into the matmuls, so for Whisper's shapes (encoder 1500x1500, decoder
<=448) this is already near-roofline; a Pallas flash kernel for the encoder is
a drop-in replacement behind the same signature.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative mask fill that is bf16-safe


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        float32_logits: bool = True) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: [B, Tq, H, D]   k, v: [B, Tk, H, D]   mask: broadcastable to [B, H, Tq, Tk]
    (True = attend).  Returns [B, Tq, H, D] in q.dtype.
    """
    dtype = q.dtype
    depth = q.shape[-1]
    scale = depth ** -0.5
    q = q * jnp.asarray(scale, q.dtype)
    if float32_logits:
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(dtype)


def causal_mask(tq: int, tk: int, offset) -> jnp.ndarray:
    """[1, 1, tq, tk] causal mask where query position i (global ``offset + i``)
    may attend to key positions <= offset + i."""
    qpos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0) + offset
    kpos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    return (kpos <= qpos)[None, None]
