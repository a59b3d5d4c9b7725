"""Quantization-aware training (QAT) via straight-through estimation.

The int8 serving stack (``ops/quant.py``: W8A8 projections/MLP, int8 KV
caches, int8 lm head) is post-training quantization — its WER cost on real
checkpoints is unvalidated in-sandbox.  QAT removes that risk at the source:
the student is *trained against the quantized forward numerics*, so the
weights it learns are the ones the int8 path will actually serve.

Recipe (standard LSQ-free STE, the production baseline for W8A8):

* **Fake-quant weights**: ``w_fq = w + sg(dq(q(w)) - w)`` with the SAME
  per-output-channel symmetric absmax math as the inference quantizer
  (``ops.quant.quantize_weight``), so train-time and serve-time weight
  values are bit-identical.  The straight-through gradient is the identity:
  the optimizer updates full-precision master weights.
* **Fake-quant activations** (``w8a8`` mode): dynamic per-row absmax, again
  sharing ``ops.quant.quantize_acts``; applied inside ``dense()`` via a
  structural ``act_fq`` marker on the transformed param subtree, so the
  model code needs no config threading.  ``(x_fq @ w_fq)`` equals the int8
  path's ``(xq @ wq) * xs * ws`` exactly in real arithmetic; the only
  divergence is fp rounding of the dequantized operands
  (tests/test_qat.py pins the agreement).
* **Scope**: the student's DECODER projections + MLP — exactly what
  ``cfg.quantize_decoder`` serves.  The distil recipe's encoder is frozen
  (usually shared with the teacher), so QAT cannot adapt it; it gets plain
  PTQ at serve time regardless.  The tied embedding stays exact: the int8
  lm head is a separately-gated opt-in (batch >= 8) and the input-embedding
  lookup is exact bf16 even in the int8 stack.

The transform is applied *inside* the loss function on the live param tree,
every step — fresh scales follow the moving weights (no stale-scale drift),
and ``value_and_grad`` flows straight through to the real parameters.

Role in the reference: none — the reference trains bf16-only and has no
quantized serving path at all; this subsystem is TPU-native value-add on top
of the reference's distillation trainer (flax/run_distillation.py:1721-1827).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .quant import (map_decoder_dense, map_encoder_dense, quantize_acts,
                    quantize_weight)

Params = Dict[str, Any]

# Zero-size leaf used as a structural marker: ``dense()`` fake-quants its
# activation input iff the param dict carries this key.  An array (not a
# bool) so the transformed subtree remains a valid pytree for jit/scan.
ACT_FQ_KEY = "act_fq"


def _ste(x: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Value of ``q``, gradient of ``x`` (straight-through estimator)."""
    return x + jax.lax.stop_gradient(q - x)


def fake_quant_weight(kernel: jnp.ndarray, contract_axis: int = -2
                      ) -> jnp.ndarray:
    """Per-output-channel int8 fake-quant with identity gradient.

    Forward value == ``dequantize(ops.quant.quantize_weight(kernel))`` —
    the exact weight values the int8 serving path multiplies against.
    """
    q, scale = quantize_weight(kernel, contract_axis)
    dq = q.astype(jnp.float32) * scale
    return _ste(kernel.astype(jnp.float32), dq).astype(kernel.dtype)


def fake_quant_acts(x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic per-row int8 fake-quant of an activation, identity gradient."""
    q, scale = quantize_acts(x)
    dq = q.astype(jnp.float32) * scale
    return _ste(x.astype(jnp.float32), dq).astype(x.dtype)


def fake_quant_acts_axes(x: jnp.ndarray, axes) -> jnp.ndarray:
    """Symmetric int8 fake-quant with absmax over ``axes`` (keepdims), STE.

    The one shared home for non-last-dim activation fake-quant (e.g. the
    flash-encoder out-projection's per-(b, t)-over-(h, k) scale in
    ``ops.encoder_attention.fused_self_attention``) — same recipe constants
    as :func:`ops.quant.quantize_acts` so QAT scales cannot drift from the
    serve-time quantizer.
    """
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    dq = jnp.clip(jnp.round(x32 / scale), -127, 127) * scale
    return _ste(x32, dq).astype(x.dtype)


def fake_quant_dense(p: Params, acts: bool) -> Params:
    """{kernel, bias?} -> same-shape tree with fake-quant kernel values
    (+ the ``act_fq`` marker in w8a8 mode)."""
    out = {"kernel": fake_quant_weight(p["kernel"])}
    if "bias" in p:
        out["bias"] = p["bias"]
    if acts:
        # stacked [L, i, o] kernels live under a lax.scan over the leading
        # axis — the marker must carry the same leading dim to be scannable
        lead = ((p["kernel"].shape[0], 0) if p["kernel"].ndim == 3 else (0,))
        out[ACT_FQ_KEY] = jnp.zeros(lead, jnp.int8)
    return out


def fake_quant_decoder_params(dec: Params, acts: bool = True) -> Params:
    """Decoder subtree -> fake-quant self/cross q/k/v/out + fc1/fc2.

    Uses the SAME traversal as ``ops.quant.quantize_decoder_params``
    (``map_decoder_dense``), so the QAT scope cannot drift from the
    serve-time quantization boundary.

    Known bounded divergence (same as the encoder note below): TPU serving
    routes decoder MLP passes with >= 256 rows (teacher-forced scoring /
    large-batch prefill — NOT single-token generation, whose B rows stay
    under the ``mlp_supported`` gate) through the fused Pallas MLP, whose
    gelu intermediate is requantized per (row, 512-chunk) — strictly finer
    than QAT's per-row fc2 input fake-quant.  The exact train==serve
    equality tests pin is on the ``dense_int8`` composition.
    """
    out = dict(dec)
    out["layers"] = map_decoder_dense(dec["layers"],
                                      lambda p: fake_quant_dense(p, acts))
    return out


def fake_quant_encoder_params(enc: Params, acts: bool = True) -> Params:
    """Encoder subtree -> fake-quant self q/k/v/out + fc1/fc2 (the
    ``quantize_encoder_params`` scope, via the shared ``map_encoder_dense``
    traversal).  Only useful when the student's encoder is UNFROZEN — a
    frozen encoder cannot adapt, so serving it int8 is plain PTQ either way.

    Known bounded divergence from the TPU serve path: serving with
    ``cfg.quantize_encoder`` runs the fused Pallas MLP (``ops/int8_mlp.py``)
    which requantizes the gelu intermediate per (row, 512-wide chunk);
    QAT's fc2 activation fake-quant is per full row.  The chunked scales
    are strictly finer (≥ the per-row accuracy QAT trained against), and
    the dense fallback path matches exactly."""
    out = dict(enc)
    out["layers"] = map_encoder_dense(enc["layers"],
                                      lambda p: fake_quant_dense(p, acts))
    return out


def fake_quant_student_params(params: Params, mode: str,
                              encoder_too: bool = False) -> Params:
    """Full student tree -> QAT forward tree.

    mode: ``"w8a8"`` (weights + dynamic activation fake-quant — the full
    serve-time numerics; the int8 stack always quantizes activations
    dynamically, so this is THE serve-matching mode) or ``"weights"``
    (weight-only fake-quant — an ablation knob, not a serving target).
    """
    if mode not in ("weights", "w8a8"):
        raise ValueError(f"quantize_student mode {mode!r} not in "
                         "('weights', 'w8a8')")
    acts = mode == "w8a8"
    out = dict(params)
    out["decoder"] = fake_quant_decoder_params(params["decoder"], acts)
    if encoder_too:
        out["encoder"] = fake_quant_encoder_params(params["encoder"], acts)
    return out
