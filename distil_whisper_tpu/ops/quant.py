"""int8 MXU quantization (W8A8, symmetric absmax).

TPU v5e's MXU runs int8 x int8 -> int32 matmuls at ~2x the bf16 peak
(394 vs 197 TOPs).  The encoder is ~100% matmul-bound at its measured
~405 ms/bs16 floor (docs/PERFORMANCE.md), so dropping its projections and
MLP onto the int8 MXU path is the single biggest remaining inference lever.

Scheme (the standard production W8A8 recipe):

* **Weights**: static symmetric per-output-channel absmax — quantized once
  at load time.  For stacked scan layouts ``[L, i, o]`` the scale is
  per ``(layer, o)``.
* **Activations**: dynamic symmetric per-row (last-dim) absmax, computed
  on the fly.  The quantize step is one VPU reduction + rescale over the
  activation; its cost is amortised by sharing one quantized buffer across
  all consumers of the same activation (q/k/v share their LN input).
* **Accumulation**: int32 on the MXU (``preferred_element_type=int32``);
  the result is rescaled in fp32 as ``y * act_scale * weight_scale`` —
  two rank-broadcast multiplies that XLA fuses into the matmul epilogue.

Max |row| of the int32 accumulator is 127*127*K; K <= 5120 everywhere in
Whisper, ~8.3e7 << 2^31, so overflow is impossible.

Role in the reference: the hardware-best-path selection the reference gets
from its sdpa/flash-attention-2 dtype flags
(/root/reference/training/run_distillation.py:129-148) — here it is an
explicit opt-in (``cfg.quantize_encoder``) with parity-bounded numerics
(tests/test_quant.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def quantize_weight(kernel: jnp.ndarray,
                    contract_axis: int = -2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel absmax int8 weight quantization.

    ``kernel`` is ``[..., i, o]`` (contraction on ``contract_axis``); the
    scale is the absmax over that axis, keepdims so it broadcasts against
    both the kernel and the matmul output.
    """
    k32 = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k32), axis=contract_axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(k32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_acts(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric per-row (last-dim) absmax int8: ``[..., K]`` ->
    (int8 ``[..., K]``, fp32 scale ``[..., 1]``)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dense_int8(p: Params, x: jnp.ndarray,
               xq: jnp.ndarray = None, xs: jnp.ndarray = None) -> jnp.ndarray:
    """``dense()`` against int8 weights ``{kernel_q [i,o], kernel_scale
    [1,o], bias?}``.  Pass a pre-quantized ``(xq, xs)`` to share one
    activation quantization across several projections."""
    if xq is None:
        xq, xs = quantize_acts(x)
    y = jnp.einsum("...i,io->...o", xq, p["kernel_q"],
                   preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs * p["kernel_scale"]
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_dense(p: Params) -> Params:
    """{kernel, bias?} -> {kernel_q, kernel_scale, bias?} (stacked [L, i, o]
    kernels quantize per (layer, output-channel))."""
    q, s = quantize_weight(p["kernel"])
    out = {"kernel_q": q, "kernel_scale": s}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def map_encoder_dense(layers: Params, fn) -> Params:
    """Apply ``fn`` to every quantizable dense subtree of an encoder layer
    stack (self-attention q/k/v/out + fc1/fc2) — THE encoder quantization
    scope.  Shared by serve-time quantization (:func:`quantize_encoder_params`)
    and QAT (:func:`ops.qat.fake_quant_encoder_params`) so the two scopes
    cannot drift apart."""
    out = dict(layers)
    out["self_attn"] = {name: fn(layers["self_attn"][name])
                        for name in ("q", "k", "v", "out")}
    for name in ("fc1", "fc2"):
        out[name] = fn(layers[name])
    return out


def map_decoder_dense(layers: Params, fn) -> Params:
    """Apply ``fn`` to every quantizable dense subtree of a decoder layer
    stack (self/cross-attention q/k/v/out + fc1/fc2) — THE decoder
    quantization scope, shared by serve-time quantization and QAT."""
    out = dict(layers)
    for attn in ("self_attn", "cross_attn"):
        out[attn] = {name: fn(layers[attn][name])
                     for name in ("q", "k", "v", "out")}
    for name in ("fc1", "fc2"):
        out[name] = fn(layers[name])
    return out


def quantize_encoder_params(enc: Params) -> Params:
    """Encoder subtree -> int8 projection/MLP weights.

    Quantized: per-layer self-attention q/k/v/out and fc1/fc2 — the ~83% of
    encoder matmul FLOPs that are d_model-contracted GEMMs.  Left untouched:
    the conv stem (3 ms, input-sensitive numerics), LayerNorms, positional
    embeddings, and the attention score/probs matmuls (head_dim 64 already
    caps MXU utilisation at 50%; int8 would not raise it).

    The forward path dispatches on tree structure (``kernel_q`` present), so
    the transformed tree drops into :func:`models.whisper.encode` unchanged.
    """
    if "kernel_q" in enc["layers"]["fc1"]:
        return enc  # already quantized (idempotent)
    out = dict(enc)
    out["layers"] = map_encoder_dense(enc["layers"], quantize_dense)
    return out


def quantize_decoder_params(dec: Params) -> Params:
    """Decoder subtree -> int8 projection/MLP weights.

    Low-batch decode is WEIGHT-read bound (large-v3 bs1: ~1.8 GB of bf16
    weight reads per token dominate the 3.5 ms/token step), so int8 weights
    nearly halve the per-token floor — the serving/speculative regime the
    reference benchmarks at bs 1-4 (README.md:425-427).  Quantized: per-layer
    self/cross-attention q/k/v/out and fc1/fc2.  Left untouched: tied
    token embeddings (the logits matmul), positional embeddings, LayerNorms.
    """
    if "kernel_q" in dec["layers"]["fc1"]:
        return dec  # already quantized (idempotent)
    out = dict(dec)
    out["layers"] = map_decoder_dense(dec["layers"], quantize_dense)
    return out


def quantize_lm_head_params(dec: Params) -> Params:
    """Add an int8 copy of the tied token embedding used ONLY for the
    output logits matmul (``tok_emb_q [V, D]`` + per-vocab-row scale).

    The logits matmul re-reads the whole [51865, 1280] table every decode
    step (~133 MB bf16 at large-v3 width — ~1/3 of the distil per-token
    weight traffic); the int8 copy halves that.  The INPUT embedding
    lookup keeps the exact bf16 table: its per-step reads are B rows, so
    exactness there is free.
    """
    if "tok_emb_q" in dec:
        return dec  # idempotent
    q, s = quantize_weight(dec["tok_emb"], contract_axis=-1)  # [V, D] -> [V, 1]
    out = dict(dec)
    out["tok_emb_q"] = q
    out["tok_emb_scale"] = s
    return out


def quantize_teacher_params(teacher: Params) -> Params:
    """Full-tree int8 quantization of a TEACHER for ``--teacher_precision
    int8`` (encoder + decoder projections; the tied embedding / lm head is
    deliberately left exact — it produces the KL target logits).

    Runs under ``jax.jit`` so it is safe on globally-sharded trees in
    multi-process runs (eager elementwise ops would touch non-addressable
    shards).
    """
    return jax.jit(lambda t: {
        **t,
        "encoder": quantize_encoder_params(t["encoder"]),
        "decoder": quantize_decoder_params(t["decoder"])})(teacher)


def maybe_quantize_encoder(params: Params, cfg) -> Params:
    """Full param tree -> int8 encoder/decoder per the cfg flags.

    Drivers call this once after loading/sharding; the forward path picks up
    the quantized weights structurally (``kernel_q`` dispatch in
    ``models.whisper.dense`` / ``ops.encoder_attention.fused_self_attention``).
    """
    if getattr(cfg, "quantize_encoder", False):
        params = {**params,
                  "encoder": quantize_encoder_params(params["encoder"])}
    if getattr(cfg, "quantize_decoder", False):
        params = {**params,
                  "decoder": quantize_decoder_params(params["decoder"])}
    if getattr(cfg, "quantize_lm_head", False):
        params = {**params,
                  "decoder": quantize_lm_head_params(params["decoder"])}
    return params

