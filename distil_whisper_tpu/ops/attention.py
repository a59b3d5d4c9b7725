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
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa
        return True
    except ImportError:  # pragma: no cover
        return False


def _flash(q, k, v, causal: bool) -> jnp.ndarray:
    """Pallas TPU flash attention.  q/k/v [B, T, H, D] -> [B, Tq, H, D].

    The kernel needs block-divisible sequence lengths; Whisper's encoder T is
    1500, so pad to a 512 multiple and mask the tail via segment ids (~2%
    extra compute at 1536).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, SegmentIds)
    scale = q.shape[-1] ** -0.5
    t = q.shape[1]
    block = 512 if t >= 512 else 128
    t_pad = -(-t // block) * block
    segment_ids = None
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
        seg = (jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], t_pad), 1)
               < t).astype(jnp.int32)
        segment_ids = SegmentIds(q=seg, kv=seg)
    out = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), segment_ids=segment_ids,
        causal=causal, sm_scale=scale)
    return out.transpose(0, 2, 1, 3)[:, :t]


def flash_padded(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 seg: Optional[jnp.ndarray] = None,
                 causal: bool = False,
                 block_q: int = 1536, block_k: int = 1536) -> jnp.ndarray:
    """Pallas TPU flash attention over ALREADY block-divisible sequences.

    q/k/v [B, T, H, D] with T a multiple of the block size; ``seg`` [B, T]
    int32 segment ids marking real (1) vs pad (0) positions — pad queries only
    see pad keys, so the tail rows are inert.  Padding is the CALLER's job,
    done once outside the layer scan (the earlier in-kernel pad/slice per
    scanned layer is what made flash lose to XLA's fused attention by ~2x).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, BlockSizes, SegmentIds)
    t = q.shape[1]
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    # Forward: whole-row blocks win at Whisper's T=1536 (measured on v5e:
    # q1536/k1536 216 ms vs q512/k512 241 ms for the 32-layer scan).
    # Backward blocks (needed when gradients flow, e.g. unfrozen-encoder
    # fine-tuning) stay at 512 to bound VMEM for the dkv/dq accumulators.
    bwd = min(512, t)
    sizes = BlockSizes(block_q=block_q, block_k_major=block_k, block_k=block_k,
                       block_b=1,
                       block_q_major_dkv=bwd, block_k_major_dkv=bwd,
                       block_k_dkv=bwd, block_q_dkv=bwd,
                       block_k_major_dq=bwd, block_k_dq=bwd,
                       block_q_dq=bwd)
    out = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        segment_ids=SegmentIds(q=seg, kv=seg) if seg is not None else None,
        causal=causal, sm_scale=q.shape[-1] ** -0.5, block_sizes=sizes)
    return out.transpose(0, 2, 1, 3)


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        causal: bool = False,
        float32_logits: bool = True,
        use_flash: Optional[bool] = None,
        dropout_rate: float = 0.0,
        dropout_rng: Optional[jax.Array] = None,
        return_probs: bool = False) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: [B, Tq, H, D]   k, v: [B, Tk, H, D]   mask: broadcastable to [B, H, Tq, Tk]
    (True = attend).  Returns [B, Tq, H, D] in q.dtype.

    ``use_flash=True`` dispatches unmasked/causal full-sequence attention to
    the Pallas flash kernel.  Default is the einsum path: measured on a real
    v5e at Whisper shapes (B8/H20/T1500/D64), XLA's fused attention inside the
    scanned encoder beats the flash kernel ~2x (the kernel wins standalone but
    loses to fusion + pays pad-to-1536 copies per layer), so flash is opt-in
    until a tuned kernel lands.
    """
    dtype = q.dtype
    if use_flash is None:
        use_flash = False
    if use_flash and mask is None and _flash_available() and not return_probs:
        return _flash(q, k, v, causal).astype(dtype)

    depth = q.shape[-1]
    scale = depth ** -0.5
    q = q * jnp.asarray(scale, q.dtype)
    # Single-token decode fast path (bf16 inference only): with Tq=1 the
    # "matmuls" are gathers/reductions the MXU runs at 1/128 row utilisation;
    # an elementwise-multiply + reduce rides the VPU at HBM bandwidth instead
    # (~25% faster per token on v5e at Whisper cross-attention shapes).
    if (q.shape[1] == 1 and not float32_logits and dropout_rate == 0.0
            and q.shape[0] == k.shape[0] and not return_probs):
        lg = jnp.sum(q[:, 0][:, None] * k, axis=-1)        # [B, Tk, H]
        logits = lg.transpose(0, 2, 1)[:, :, None, :]      # [B, H, 1, Tk]
        if causal and mask is None:
            mask = causal_mask(1, k.shape[1], 0)
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        pv = probs[:, :, 0].transpose(0, 2, 1)             # [B, Tk, H]
        # fp32 accumulation over Tk, matching the einsum path's
        # preferred_element_type=f32 for the AV product
        out = jnp.sum((pv[..., None] * v).astype(jnp.float32), axis=1)
        return out[:, None].astype(dtype)                  # [B, 1, H, D]
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


def causal_mask(tq: int, tk: int, offset) -> jnp.ndarray:
    """[1, 1, tq, tk] causal mask where query position i (global ``offset + i``)
    may attend to key positions <= offset + i."""
    qpos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0) + offset
    kpos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    return (kpos <= qpos)[None, None]
