"""Whisper encoder-decoder, pure-functional JAX.

One implementation serves training, short-form inference, long-form and
speculative decoding (the reference maintains three copies: torch, flax model,
flax drivers — cf. SURVEY.md §2).  Design choices, TPU-first:

* **Stacked layers + ``lax.scan``**: all per-layer weights carry a leading
  ``layers`` axis; the forward pass scans one super-block.  This is what the
  reference builds with flax ``scan_with_axes`` and a scan<->unroll converter
  (modeling_flax_whisper.py:543-651, :1270-1458) — here it is simply the native
  parameter layout.
* **Static shapes**: encoder always sees [B, n_mels, 3000] -> [B, 1500, d];
  the decoder KV cache is a fixed [L, B, 448, H, hd] ring written with
  ``dynamic_update_slice`` (cf. the one-hot cache trick at
  modeling_flax_whisper.py:384-453 — same contract, simpler primitive).
* **fp32 islands in a bf16 sea**: LayerNorm and softmax run fp32 internally
  (reference layers.py:759-812, :123-194); matmuls ride the MXU in bf16.
* **Remat**: ``remat=True`` wraps each scanned layer in ``jax.checkpoint``
  (reference's ``gradient_checkpointing``, modeling_flax_whisper.py:563-571).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..ops.attention import (mha, causal_mask, decode_attention,
                             _flash_available)
from ..ops.encoder_attention import fused_self_attention
from ..ops.quant import dense_int8

Params = Dict[str, Any]


# ----------------------------------------------------------------------
# Primitives
# ----------------------------------------------------------------------


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5,
               fp32: bool = True) -> jnp.ndarray:
    """LayerNorm with fp32 internals (T5X-style), output in x.dtype.

    ``fp32=False`` keeps the statistics in x.dtype (the opt-in
    ``fast_approx_activations`` inference mode).
    """
    dtype = x.dtype
    xs = x.astype(jnp.float32) if fp32 else x
    mean = jnp.mean(xs, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xs - mean), axis=-1, keepdims=True)
    y = (xs - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(y.dtype)
            + p["bias"].astype(y.dtype)).astype(dtype)


def dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Inverted dropout; identity when rate==0 or rng is None (inference)."""
    if rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_q" in p:
        # int8-quantized weights (ops.quant.quantize_encoder_params):
        # W8A8 dot on the int8 MXU path, fp32 rescale epilogue
        return dense_int8(p, x)
    if "act_fq" in p:
        # QAT w8a8 mode (ops.qat): the kernel values are already fake-
        # quantized by the tree transform; fake-quant the activation here so
        # the training forward matches the int8 serving numerics exactly.
        from ..ops.qat import fake_quant_acts
        x = fake_quant_acts(x)
    y = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, t, h, hd = x.shape
    return x.reshape(b, t, h * hd)


def attention_block(p: Params, x_q: jnp.ndarray, x_kv: jnp.ndarray,
                    n_heads: int, mask=None,
                    attn_dropout: float = 0.0, rng=None,
                    f32_attn: bool = True) -> jnp.ndarray:
    """Full (uncached) MHA: project, attend, output-project."""
    q = _split_heads(dense(p["q"], x_q), n_heads)
    k = _split_heads(dense(p["k"], x_kv), n_heads)
    v = _split_heads(dense(p["v"], x_kv), n_heads)
    return dense(p["out"], _merge_heads(
        mha(q, k, v, mask, float32_logits=f32_attn,
            dropout_rate=attn_dropout, dropout_rng=rng)))


def mlp_block(fc1: Params, fc2: Params, x: jnp.ndarray,
              act_dropout: float = 0.0, rng=None,
              exact_gelu: bool = True) -> jnp.ndarray:
    if "kernel_q" in fc1 and act_dropout == 0.0 and exact_gelu:
        # fused int8 Pallas MLP: the gelu intermediate never touches HBM
        # (ops/int8_mlp.py); falls back to dense_int8 off-TPU / odd shapes
        from ..ops.int8_mlp import fused_int8_mlp, mlp_supported
        if mlp_supported(fc1, x) and _flash_available():
            return fused_int8_mlp(fc1, fc2, x)
    h = jax.nn.gelu(dense(fc1, x), approximate=not exact_gelu)
    h = dropout(h, act_dropout, rng)
    return dense(fc2, h)


# ----------------------------------------------------------------------
# Encoder
# ----------------------------------------------------------------------


def _conv1d(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """x [B, T, C_in], kernel (3, C_in, C_out), SAME-1 padding like torch.

    Computed as a 3-tap sum of shifted matmuls rather than
    ``lax.conv_general_dilated``: numerically identical (verified on-chip,
    scripts/ablate_conv_stem.py), same speed (the stem is ~3 ms at bs16),
    and — unlike the conv primitive — its VJP is dtype-clean under
    ``preferred_element_type=f32`` with bf16 operands, which training an
    UNFROZEN encoder in half_mixed precision hits (the conv VJP raises
    'requires arguments to have the same dtypes')."""
    k = p["kernel"].astype(x.dtype)
    b, t, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    acc = None
    for d in range(3):
        xs = jax.lax.slice_in_dim(xp, d, d + t, axis=1)
        if stride > 1:
            xs = xs[:, ::stride]
        y = jnp.einsum("bti,io->bto", xs, k[d],
                       preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc.astype(x.dtype) + p["bias"].astype(x.dtype)


def _encoder_layer(lp: Params, x: jnp.ndarray, n_heads: int,
                   rates: Tuple[float, float, float] = (0.0, 0.0, 0.0),
                   rng=None,
                   policy: Tuple[bool, bool, bool] = (True, False, False),
                   t_real: Optional[int] = None) -> jnp.ndarray:
    f32_attn, fast_act, use_fused = policy
    drop, attn_drop, act_drop = rates
    rngs = jax.random.split(rng, 4) if rng is not None else (None,) * 4
    r = x
    x = layer_norm(lp["self_attn_ln"], x, fp32=not fast_act)
    if use_fused:
        # In-tree Pallas kernel (ops/encoder_attention.py): single-pass
        # whole-row softmax, q/k/v projected straight into [B,H,T,D] — never
        # materialises the [B,H,T,T] logits in HBM (XLA's fused attention
        # writes the probs per layer — the dominant encoder-attention cost at
        # T=1500 in bf16).  Input is padded once by encode().
        x = fused_self_attention(lp["self_attn"], x, n_heads,
                                 t_real or x.shape[1])
    else:
        x = attention_block(lp["self_attn"], x, x, n_heads,
                            attn_dropout=attn_drop, rng=rngs[0],
                            f32_attn=f32_attn)
    x = r + dropout(x, drop, rngs[1])
    r = x
    x = layer_norm(lp["final_ln"], x, fp32=not fast_act)
    x = mlp_block(lp["fc1"], lp["fc2"], x, act_dropout=act_drop, rng=rngs[2],
                  exact_gelu=not fast_act)
    return r + dropout(x, drop, rngs[3])


def encode(params: Params, cfg: WhisperConfig, mel: jnp.ndarray,
           dtype=jnp.float32, remat: bool = False,
           output_hidden_states: bool = False,
           freeze: bool = False,
           dropout_rng: Optional[jax.Array] = None):
    """mel [B, n_mels, 3000] -> encoder states [B, 1500, d].

    With ``output_hidden_states`` also returns [n_layers+1, B, 1500, d]
    (embedding output + every layer output, HF convention) for hidden-state
    distillation.  ``freeze`` stops gradients at the output (reference
    modeling_flax_whisper.py:1152-1153).  ``dropout_rng`` enables the config's
    dropout/attention_dropout/activation_dropout rates (training only).
    """
    rates = (cfg.dropout, cfg.attention_dropout, cfg.activation_dropout)
    use_dropout = dropout_rng is not None and any(r > 0 for r in rates)
    x = mel.astype(dtype).transpose(0, 2, 1)  # [B, 3000, n_mels]
    x = jax.nn.gelu(_conv1d(params["conv1"], x, 1), approximate=False)
    x = jax.nn.gelu(_conv1d(params["conv2"], x, 2), approximate=False)  # [B,1500,d]
    # Sinusoidal positions are constants, never trained
    # (reference modeling_flax_whisper.py:982-985).
    x = x + jax.lax.stop_gradient(params["pos_emb"]).astype(dtype)

    use_fused = (cfg.use_flash_encoder and not (use_dropout and
                                                cfg.attention_dropout > 0)
                 and _flash_available())
    t_real = x.shape[1]
    if use_fused:
        # Pad ONCE to a block multiple; the kernel masks pad KEYS and pad
        # query rows stay garbage in their own rows until the final slice.
        t_pad = -(-t_real // 512) * 512 if t_real >= 512 else -(-t_real // 128) * 128
        if t_pad != t_real:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t_real), (0, 0)))

    policy = (not cfg.fast_bf16_attention, cfg.fast_approx_activations,
              use_fused)
    layer = _encoder_layer
    if remat:
        layer = jax.checkpoint(layer, static_argnums=(2, 3, 5, 6))

    if use_dropout:
        rng, emb_rng = jax.random.split(dropout_rng)
        x = dropout(x, cfg.dropout, emb_rng)
        layer_rngs = jax.random.split(rng, cfg.encoder_layers)

        def body(carry, xs):
            lp, lrng = xs
            y = layer(lp, carry, cfg.encoder_attention_heads, rates, lrng,
                      policy, t_real)
            return y, (carry if output_hidden_states else None)

        y, hs = jax.lax.scan(body, x, (params["layers"], layer_rngs))
    else:
        def body(carry, lp):
            y = layer(lp, carry, cfg.encoder_attention_heads,
                      (0.0, 0.0, 0.0), None, policy, t_real)
            return y, (carry if output_hidden_states else None)

        y, hs = jax.lax.scan(body, x, params["layers"])
    if y.shape[1] != t_real:
        y = y[:, :t_real]
        if output_hidden_states:
            hs = hs[:, :, :t_real]
    y = layer_norm(params["ln_post"], y)
    if freeze:
        y = jax.lax.stop_gradient(y)
    if output_hidden_states:
        all_hs = jnp.concatenate([hs, y[None]], axis=0)
        return y, all_hs
    return y


# ----------------------------------------------------------------------
# Decoder (shared path for training, prefill and cached decode)
# ----------------------------------------------------------------------


def init_cache(cfg: WhisperConfig, batch: int, dtype=jnp.float32,
               max_len: Optional[int] = None,
               quantize: Optional[bool] = None) -> Params:
    """Static-shape self-attention KV cache: [L, B, max_len, H*hd].

    Heads are stored MERGED (minor dim = d_model) so the cache buffer fills
    full 128-lane tile rows; a head-split [.., H, 64] layout would waste
    ~2x HBM bytes and bandwidth on every per-token read
    (see ops.attention.decode_attention).

    With ``quantize`` (default ``cfg.quantize_self_kv``) K/V are stored int8
    with a per-(layer, batch, token) fp32 absmax scale — per-token because
    tokens arrive incrementally (a global scale can't cover unseen tokens),
    per-tensor over d_model so the dequant is a clean minor-dim broadcast
    multiply that XLA fuses into the attention's operand load.  Halves the
    self-cache HBM read traffic of deep (teacher) decodes.
    """
    max_len = max_len or cfg.max_target_positions
    h, hd = cfg.decoder_attention_heads, cfg.decoder_head_dim
    shape = (cfg.decoder_layers, batch, max_len, h * hd)
    if quantize is None:
        quantize = cfg.quantize_self_kv
    if quantize:
        sshape = shape[:-1]
        return {"k_q": jnp.zeros(shape, jnp.int8),
                "k_scale": jnp.zeros(sshape, jnp.float32),
                "v_q": jnp.zeros(shape, jnp.int8),
                "v_scale": jnp.zeros(sshape, jnp.float32)}
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _self_kv_quantize(x: jnp.ndarray):
    """[B, S, d] -> (int8 [B, S, d], fp32 scale [B, S]) per-token absmax."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _cache_kv_parts(cache: Params, name: str):
    """Cache dict -> per-KV tuple-of-arrays: (buf,) plain or (q, scale)."""
    if "k_q" in cache:
        return (cache[f"{name}_q"], cache[f"{name}_scale"])
    return (cache[name],)


def _cache_from_parts(k_parts, v_parts) -> Params:
    if len(k_parts) == 2:
        return {"k_q": k_parts[0], "k_scale": k_parts[1],
                "v_q": v_parts[0], "v_scale": v_parts[1]}
    return {"k": k_parts[0], "v": v_parts[0]}


def _per_lane_pos(pos) -> bool:
    """True when ``pos`` is a per-sample [B] cursor array (each batch lane
    writes/attends at its own position — the continuous-batching decode)."""
    return getattr(pos, "ndim", 0) == 1


def _row_update(buf: jnp.ndarray, upd: jnp.ndarray, pos) -> jnp.ndarray:
    """``dynamic_update_slice_in_dim(buf, upd, pos, axis=1)`` where ``pos``
    may be a scalar or a per-lane [B] array (buf/upd lead with B)."""
    if _per_lane_pos(pos):
        return jax.vmap(lambda b, u, p:
                        jax.lax.dynamic_update_slice_in_dim(b, u, p, axis=0)
                        )(buf, upd, pos)
    return jax.lax.dynamic_update_slice_in_dim(buf, upd, pos, axis=1)


def _kv_parts_write(parts, kv: jnp.ndarray, pos) -> tuple:
    """Write new-token K or V [B, S, d] at ``pos`` into a PER-LAYER parts
    tuple (arrays without the leading L axis)."""
    if len(parts) == 1:
        return (_row_update(parts[0], kv.astype(parts[0].dtype), pos),)
    q, s = _self_kv_quantize(kv)
    return (_row_update(parts[0], q, pos),
            _row_update(parts[1], s, pos))


def _kv_parts_read(parts, dtype) -> jnp.ndarray:
    """Per-layer parts tuple -> merged [B, T, d] K or V in ``dtype``."""
    if len(parts) == 1:
        return parts[0].astype(dtype)
    return parts[0].astype(dtype) * parts[1][..., None].astype(dtype)


def _layer_row_update(buf: jnp.ndarray, upd: jnp.ndarray, layer_i,
                      pos) -> jnp.ndarray:
    """Write ``upd`` [B, S, ...] at (``layer_i``, :, ``pos``) into ``buf``
    [L, B, T, ...]; ``pos`` scalar or per-lane [B]."""
    if _per_lane_pos(pos):
        if upd.ndim == 3:  # [B, S, d] into [L, B, T, d]
            return jax.vmap(
                lambda b, u, p: jax.lax.dynamic_update_slice(
                    b, u[None], (layer_i, p, 0)),
                in_axes=(1, 0, 0), out_axes=1)(buf, upd, pos)
        return jax.vmap(  # scale: [B, S] into [L, B, T]
            lambda b, u, p: jax.lax.dynamic_update_slice(
                b, u[None], (layer_i, p)),
            in_axes=(1, 0, 0), out_axes=1)(buf, upd, pos)
    start = (layer_i, 0, pos, 0)[:buf.ndim]
    return jax.lax.dynamic_update_slice(buf, upd[None], start)


def _kv_parts_write_layer(parts, kv: jnp.ndarray, layer_i, pos) -> tuple:
    """Write K or V [B, S, d] at (``layer_i``, ``pos``) into FULL-cache parts
    (arrays carrying the leading L axis — the deep-decoder carry layout)."""
    if len(parts) == 1:
        return (_layer_row_update(parts[0], kv.astype(parts[0].dtype),
                                  layer_i, pos),)
    q, s = _self_kv_quantize(kv)
    return (_layer_row_update(parts[0], q, layer_i, pos),
            _layer_row_update(parts[1], s, layer_i, pos))


def _kv_parts_read_layer(parts, layer_i, dtype) -> jnp.ndarray:
    got = tuple(jax.lax.dynamic_index_in_dim(p, layer_i, 0, keepdims=False)
                for p in parts)
    return _kv_parts_read(got, dtype)


def cross_kv(params: Params, cfg: WhisperConfig, enc: jnp.ndarray,
             quantize: Optional[bool] = None) -> Params:
    """Cross-attention K/V, computed once per utterance: [L, B, 1500, H*hd].

    Heads are stored MERGED (see :func:`init_cache`): reading the cross K/V
    is the dominant per-token HBM traffic of long decodes (32 layers x
    2 x [B,1500,d] for the teacher) and the merged layout streams at native
    128-lane rows.  With ``quantize`` (default ``cfg.quantize_cross_kv``)
    K/V are stored int8 with per-(layer, batch, head) absmax scales expanded
    to a [B, 1, d] vector so the dequant multiply stays elementwise on the
    merged buffer (and fuses into the attention's operand load under XLA).
    """
    h = cfg.decoder_attention_heads
    hd = cfg.decoder_head_dim
    if quantize is None:
        quantize = cfg.quantize_cross_kv

    def q8(x):
        # per (batch, head) absmax scale on the merged [B, T, H*hd] layout
        b, t, d = x.shape
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)).reshape(b, t, h, hd),
                       axis=(1, 3))                         # [B, H]
        scale = jnp.maximum(amax, 1e-8) / 127.0
        scale_vec = jnp.repeat(scale, hd, axis=-1)[:, None]  # [B, 1, d]
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale_vec),
                     -127, 127).astype(jnp.int8)
        return q, scale_vec.astype(jnp.float32)

    def per_layer(lp):
        k = dense(lp["cross_attn"]["k"], enc)
        v = dense(lp["cross_attn"]["v"], enc)
        if quantize:
            # quantise INSIDE the layer map so only one layer's bf16 K/V is
            # ever live — peak HBM stays ~int8-sized for deep teachers
            kq, ks = q8(k)
            vq, vs = q8(v)
            return kq, ks, vq, vs
        return k, v

    out = jax.lax.map(per_layer, params["layers"])
    if not quantize:
        return {"k": out[0], "v": out[1]}
    return {"k_q": out[0], "k_scale": out[1],
            "v_q": out[2], "v_scale": out[3]}




def _cross_scan_xs(cross: Params, dtype):
    """Per-layer scan inputs from either cross-KV storage format."""
    if "k" in cross:
        return (cross["k"].astype(dtype), cross["v"].astype(dtype))
    # int8-quantized storage; dequant per layer INSIDE the scan so only int8
    # bytes cross HBM (the multiply fuses into the matmul operand load)
    return (cross["k_q"], cross["k_scale"], cross["v_q"], cross["v_scale"])


def _dequant_part(part, dtype):
    """Per-layer merged [B, T, d] K/V from a :func:`_cross_scan_xs` slice."""
    if len(part) == 2:
        return part
    kq, ks, vq, vs = part
    return (kq.astype(dtype) * ks.astype(dtype),
            vq.astype(dtype) * vs.astype(dtype))


def _split_kv(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """Merged [B, T, H*hd] -> head-split [B, T, H, hd] view (for the exact
    einsum attention paths; the bf16 single-token fast path consumes the
    merged layout directly via ops.attention.decode_attention)."""
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def _decoder_layer(lp: Params, x: jnp.ndarray, self_k, self_v, ck, cv,
                   n_heads: int, self_mask, self_causal: bool = False,
                   rates: Tuple[float, float, float] = (0.0, 0.0, 0.0),
                   rng=None,
                   policy: Tuple[bool, bool] = (True, False),
                   output_cross_probs: bool = False):
    """One decoder layer given already-materialised K/V for both attentions.

    Returns ``(y, cross_probs | None)`` — probs are the fp32 [B, H, S, Tk]
    cross-attention weights (DTW word-timestamp alignment needs them).
    """
    f32_attn, fast_act = policy
    drop, attn_drop, act_drop = rates
    rngs = jax.random.split(rng, 6) if rng is not None else (None,) * 6
    r = x
    h = layer_norm(lp["self_attn_ln"], x, fp32=not fast_act)
    q = _split_heads(dense(lp["self_attn"]["q"], h), n_heads)
    a = mha(q, self_k, self_v, self_mask, causal=self_causal,
            float32_logits=f32_attn,
            dropout_rate=attn_drop, dropout_rng=rngs[0])
    x = r + dropout(dense(lp["self_attn"]["out"], _merge_heads(a)),
                    drop, rngs[1])

    r = x
    h = layer_norm(lp["cross_attn_ln"], x, fp32=not fast_act)
    q = _split_heads(dense(lp["cross_attn"]["q"], h), n_heads)
    cross_probs = None
    if output_cross_probs:
        a, cross_probs = mha(q, ck, cv, float32_logits=f32_attn,
                             return_probs=True)
    else:
        a = mha(q, ck, cv, float32_logits=f32_attn,
                dropout_rate=attn_drop, dropout_rng=rngs[2])
    x = r + dropout(dense(lp["cross_attn"]["out"], _merge_heads(a)),
                    drop, rngs[3])

    r = x
    h = layer_norm(lp["final_ln"], x, fp32=not fast_act)
    h = mlp_block(lp["fc1"], lp["fc2"], h, act_dropout=act_drop, rng=rngs[4],
                  exact_gelu=not fast_act)
    y = r + dropout(h, drop, rngs[5])
    return (y, cross_probs) if output_cross_probs else y


def decode(params: Params, cfg: WhisperConfig, tokens: jnp.ndarray,
           enc: Optional[jnp.ndarray] = None,
           cross: Optional[Params] = None,
           cache: Optional[Params] = None,
           pos_offset=0,
           attention_mask: Optional[jnp.ndarray] = None,
           pad_len: Optional[jnp.ndarray] = None,
           dtype=jnp.float32, remat: bool = False,
           output_hidden_states: bool = False,
           dropout_rng: Optional[jax.Array] = None,
           skip_logits: bool = False):
    """Decoder forward.

    tokens [B, S] at global cache slots ``pos_offset .. pos_offset+S-1``.
    Exactly one of ``enc`` (encoder states, K/V projected on the fly) or
    ``cross`` (precomputed K/V from :func:`cross_kv`) must be given.

    ``pos_offset`` may be a per-lane [B] int32 array: each batch lane then
    writes its K/V, reads its positions and masks its attention at its OWN
    cursor (continuous-batching serving, where lanes are admitted and retired
    independently — :mod:`...serving_engine`).  Per-lane offsets require
    ``pad_len is None`` (each lane starts at slot 0 with its own prompt).

    Without ``cache``: full self-attention over S (training / scoring path).
    With ``cache``: keys/values are written into the static cache at
    ``pos_offset`` and attention spans the whole cache (generation path).

    ``pad_len`` [B] supports *left-padded prompts* with one compiled program:
    the first ``pad_len[b]`` cache slots are padding — they are masked out of
    self-attention and position embeddings are shifted so the first real token
    sits at position 0 (the HF batched-long-form convention: left-pad +
    decoder_attention_mask).

    Returns ``(logits [B, S, V], new_cache, hidden_states?)`` where
    hidden_states is [n_layers+1, B, S, d] when requested.
    """
    b, s = tokens.shape
    n_heads = cfg.decoder_attention_heads
    assert not (_per_lane_pos(pos_offset) and pad_len is not None), \
        "per-lane pos_offset and pad_len are mutually exclusive"

    tok_emb = params["tok_emb"]
    x = tok_emb.astype(dtype)[tokens]
    if pad_len is None and _per_lane_pos(pos_offset):
        # Per-lane cursors (continuous-batching decode): lane b's tokens sit
        # at positions pos_offset[b] .. pos_offset[b]+S-1.
        positions = jnp.clip(
            pos_offset[:, None].astype(jnp.int32)
            + jax.lax.broadcasted_iota(jnp.int32, (b, s), 1),
            0, cfg.max_target_positions - 1)
        pos = params["pos_emb"].astype(dtype)[positions]
    elif pad_len is None:
        # Learned positions, sliced at the (possibly dynamic) offset.
        pos = jax.lax.dynamic_slice_in_dim(params["pos_emb"].astype(dtype),
                                           pos_offset, s, axis=0)
    else:
        # Per-sample shift: slot j holds absolute position j - pad_len[b].
        slots = pos_offset + jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
        positions = jnp.clip(slots - pad_len[:, None].astype(jnp.int32), 0,
                             cfg.max_target_positions - 1)
        pos = params["pos_emb"].astype(dtype)[positions]
    x = x + pos

    self_causal = False
    if cache is not None:
        tk = (cache["k"] if "k" in cache else cache["k_q"]).shape[2]
        self_mask = causal_mask(s, tk, pos_offset)
    elif attention_mask is None and pad_len is None:
        # pure causal full-sequence attention: leave the mask implicit so the
        # flash kernel handles it (training fast path)
        tk = s
        self_mask = None
        self_causal = True
    else:
        tk = s
        self_mask = causal_mask(s, s, 0)
    if pad_len is not None:
        key_slots = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, tk), 3)
        self_mask = jnp.logical_and(
            self_mask, key_slots >= pad_len[:, None, None, None].astype(jnp.int32))
    if attention_mask is not None:
        # [B, S_k] padding mask combined with causality (training only).
        self_mask = jnp.logical_and(self_mask, attention_mask[:, None, None, :])

    policy = (not cfg.fast_bf16_attention, cfg.fast_approx_activations)
    layer = _decoder_layer
    if remat:
        layer = jax.checkpoint(layer, static_argnums=(6, 8, 9, 11))

    if cross is None:
        assert enc is not None, "decode() needs enc or cross"
        cross = cross_kv(params, cfg, enc.astype(dtype))
    cross_xs = _cross_scan_xs(cross, dtype)

    def _ck_cv(part):
        return _dequant_part(part, dtype)

    if cache is None:
        rates = (cfg.dropout, cfg.attention_dropout, cfg.activation_dropout)
        use_dropout = dropout_rng is not None and any(r > 0 for r in rates)
        if use_dropout:
            rng, emb_rng = jax.random.split(dropout_rng)
            x = dropout(x, cfg.dropout, emb_rng)
            layer_rngs = jax.random.split(rng, cfg.decoder_layers)
        else:
            rates = (0.0, 0.0, 0.0)
            layer_rngs = None

        def body(carry, xs):
            if use_dropout:
                lp, cross_part, lrng = xs
            else:
                (lp, cross_part), lrng = xs, None
            ck, cv = (_split_kv(t, n_heads) for t in _ck_cv(cross_part))
            h = layer_norm(lp["self_attn_ln"], carry)
            k = _split_heads(dense(lp["self_attn"]["k"], h), n_heads)
            v = _split_heads(dense(lp["self_attn"]["v"], h), n_heads)
            y = layer(lp, carry, k, v, ck, cv, n_heads, self_mask,
                      self_causal, rates, lrng, policy)
            return y, (carry if output_hidden_states else None)

        xs = ((params["layers"], cross_xs, layer_rngs) if use_dropout
              else (params["layers"], cross_xs))
        y, hs = jax.lax.scan(body, x, xs)
        new_cache = None
    else:
        f32_attn, fast_act = policy
        # bf16 single-token steps consume the merged cache/cross layout
        # directly (no [.., H, 64] materialisation — see decode_attention);
        # prefill (S>1) and fp32-parity runs take the exact einsum path on
        # head-split views of the same buffers (identical values).
        merged_fast = (s == 1) and not f32_attn
        # Small multi-token windows (speculative verify, S = gamma+1) stay on
        # the head-split einsum: the merged-layout generalisation
        # (ops.attention.decode_attention_multi) measured SLOWER at the
        # verify shape (~53 vs ~44 us/layer, scripts/ablate_verify_attn.py)
        # — at S>1 the S-times probs-expand traffic outweighs the layout
        # win that makes the S=1 trick 2.6x.  Kept as a documented negative
        # result, unit-tested but not wired.
        mask2 = None
        if merged_fast and self_mask is not None:
            mask2 = self_mask[:, 0, 0, :]                  # [B or 1, Tk]

        def cached_layer(lp, x, cache_k_l, cache_v_l, ck, cv):
            """One decoder layer against merged-layout K/V [B, T, d]."""
            r = x
            h = layer_norm(lp["self_attn_ln"], x, fp32=not fast_act)
            q = dense(lp["self_attn"]["q"], h)
            if merged_fast:
                a = decode_attention(q[:, 0], cache_k_l.astype(dtype),
                                     cache_v_l.astype(dtype), n_heads,
                                     mask2)[:, None]
            else:
                a = _merge_heads(mha(
                    _split_heads(q, n_heads),
                    _split_kv(cache_k_l.astype(dtype), n_heads),
                    _split_kv(cache_v_l.astype(dtype), n_heads),
                    self_mask, float32_logits=f32_attn))
            x = r + dense(lp["self_attn"]["out"], a)

            r = x
            h = layer_norm(lp["cross_attn_ln"], x, fp32=not fast_act)
            q = dense(lp["cross_attn"]["q"], h)
            if merged_fast:
                a = decode_attention(q[:, 0], ck, cv, n_heads)[:, None]
            else:
                a = _merge_heads(mha(
                    _split_heads(q, n_heads), _split_kv(ck, n_heads),
                    _split_kv(cv, n_heads), float32_logits=f32_attn))
            x = r + dense(lp["cross_attn"]["out"], a)

            r = x
            h = layer_norm(lp["final_ln"], x, fp32=not fast_act)
            return r + mlp_block(lp["fc1"], lp["fc2"], h,
                                 exact_gelu=not fast_act)

        def new_kv(lp, x):
            h = layer_norm(lp["self_attn_ln"], x, fp32=not fast_act)
            return (dense(lp["self_attn"]["k"], h),
                    dense(lp["self_attn"]["v"], h))         # [B, S, d]

        k_parts = _cache_kv_parts(cache, "k")
        v_parts = _cache_kv_parts(cache, "v")
        if cfg.decoder_layers <= 4:
            # Shallow (distil) decoders: full unroll — XLA fuses across the
            # 2-4 layers and aliases the per-layer cache slices in place.
            def body(carry, xs):
                lp, cross_part, kp, vp = xs
                ck, cv = _ck_cv(cross_part)
                k, v = new_kv(lp, carry)
                kp = _kv_parts_write(kp, k, pos_offset)
                vp = _kv_parts_write(vp, v, pos_offset)
                y = cached_layer(lp, carry, _kv_parts_read(kp, dtype),
                                 _kv_parts_read(vp, dtype), ck, cv)
                return y, (kp, vp,
                           carry if output_hidden_states else None)

            y, (nkp, nvp, hs) = jax.lax.scan(
                body, x, (params["layers"], cross_xs, k_parts, v_parts),
                unroll=cfg.decoder_layers)
        else:
            # Deep (teacher) decoders: the cache rides the scan CARRY and
            # each layer writes ONLY the new token's slice in place — the
            # xs->ys pattern would rewrite the whole [L,B,T,d] cache every
            # token (~1 GB/token of extra writes for large-v3 at bs16).
            def body(carry, xs):
                y_in, kp, vp = carry
                i, lp, cross_part = xs
                ck, cv = _ck_cv(cross_part)
                k, v = new_kv(lp, y_in)
                kp = _kv_parts_write_layer(kp, k, i, pos_offset)
                vp = _kv_parts_write_layer(vp, v, i, pos_offset)
                ck_l = _kv_parts_read_layer(kp, i, dtype)
                cv_l = _kv_parts_read_layer(vp, i, dtype)
                y = cached_layer(lp, y_in, ck_l, cv_l, ck, cv)
                return ((y, kp, vp),
                        y_in if output_hidden_states else None)

            (y, nkp, nvp), hs = jax.lax.scan(
                body, (x, k_parts, v_parts),
                (jnp.arange(cfg.decoder_layers), params["layers"], cross_xs))
        new_cache = _cache_from_parts(nkp, nvp)

    y = layer_norm(params["ln"], y)
    if skip_logits:
        # caller projects per-chunk (training.losses.chunked_ce_kl) — the
        # full [B, S, V] logits never materialise
        logits = y
    elif "tok_emb_q" in params and b >= 8:
        # int8 logits matmul (cfg.quantize_lm_head): W8A8 against the int8
        # copy of the tied embedding; per-token activation scale, per-vocab-
        # row weight scale, fp32 rescale epilogue (ops/quant.py).
        # Gated on batch >= 8: at bs1 XLA's int8 GEMV path LOSES badly
        # (teacher-alone 643 -> 921 ms/256tok measured) while bs16 gains
        # ~6%; gating on b (not b*s) keeps prefill and per-step decode on
        # the same numerics within one generation.
        from ..ops.quant import quantize_acts
        yq, ys = quantize_acts(y)
        logits = jnp.einsum("bsd,vd->bsv", yq, params["tok_emb_q"],
                            preferred_element_type=jnp.int32)
        logits = (logits.astype(jnp.float32) * ys
                  * params["tok_emb_scale"][:, 0])
    else:
        logits = jnp.einsum("bsd,vd->bsv", y, tok_emb.astype(dtype),
                            preferred_element_type=jnp.float32)

    if output_hidden_states:
        all_hs = jnp.concatenate([hs, y[None]], axis=0)
        return logits, new_cache, all_hs
    return logits, new_cache


def cross_attention_weights(params: Params, cfg: WhisperConfig,
                            tokens: jnp.ndarray,
                            enc: Optional[jnp.ndarray] = None,
                            cross: Optional[Params] = None,
                            dtype=jnp.float32) -> jnp.ndarray:
    """fp32 cross-attention probabilities [L, B, H, S, Tk] of a teacher-forced
    decoder pass over ``tokens`` [B, S].

    Cross-attention rows depend only on the decoder hidden state at their own
    position, so this single pass reproduces exactly the per-step
    cross_attentions HF collects during cached generation
    (generation_whisper.py::_extract_token_timestamps input) — used for the
    DTW word-timestamp alignment.
    """
    b, s = tokens.shape
    n_heads = cfg.decoder_attention_heads
    x = params["tok_emb"].astype(dtype)[tokens.astype(jnp.int32)]
    x = x + params["pos_emb"].astype(dtype)[:s]
    if cross is None:
        assert enc is not None
        cross = cross_kv(params, cfg, enc.astype(dtype))
    cross_xs = _cross_scan_xs(cross, dtype)
    policy = (not cfg.fast_bf16_attention, cfg.fast_approx_activations)

    def body(carry, xs):
        lp, cross_part = xs
        ck, cv = (_split_kv(t, n_heads)
                  for t in _dequant_part(cross_part, dtype))
        h = layer_norm(lp["self_attn_ln"], carry)
        k = _split_heads(dense(lp["self_attn"]["k"], h), n_heads)
        v = _split_heads(dense(lp["self_attn"]["v"], h), n_heads)
        y, probs = _decoder_layer(lp, carry, k, v, ck, cv, n_heads, None,
                                  True, (0.0, 0.0, 0.0), None, policy,
                                  output_cross_probs=True)
        return y, probs

    _, probs = jax.lax.scan(body, x, (params["layers"], cross_xs))
    return probs


# ----------------------------------------------------------------------
# Full forward (training path)
# ----------------------------------------------------------------------


def forward(params: Params, cfg: WhisperConfig, mel: jnp.ndarray,
            decoder_input_ids: jnp.ndarray,
            decoder_attention_mask: Optional[jnp.ndarray] = None,
            dtype=jnp.float32, remat: bool = False,
            freeze_encoder: bool = False,
            output_hidden_states: bool = False,
            dropout_rng: Optional[jax.Array] = None):
    """Encoder + teacher-forced decoder.  Returns logits (+ aux dict).

    ``params`` is the full tree ({'encoder': ..., 'decoder': ...});
    :func:`encode`/:func:`decode` take the respective subtrees directly.
    """
    enc_rng = dec_rng = None
    if dropout_rng is not None:
        enc_rng, dec_rng = jax.random.split(dropout_rng)
    if output_hidden_states:
        enc, enc_hs = encode(params["encoder"], cfg, mel, dtype=dtype,
                             remat=remat, output_hidden_states=True,
                             freeze=freeze_encoder, dropout_rng=enc_rng)
        logits, _, dec_hs = decode(
            params["decoder"], cfg, decoder_input_ids, enc=enc,
            attention_mask=decoder_attention_mask, dtype=dtype, remat=remat,
            output_hidden_states=True, dropout_rng=dec_rng)
        return logits, {"encoder_last_hidden_state": enc,
                        "encoder_hidden_states": enc_hs,
                        "decoder_hidden_states": dec_hs}
    enc = encode(params["encoder"], cfg, mel, dtype=dtype, remat=remat,
                 freeze=freeze_encoder, dropout_rng=enc_rng)
    logits, _ = decode(params["decoder"], cfg, decoder_input_ids, enc=enc,
                       attention_mask=decoder_attention_mask,
                       dtype=dtype, remat=remat, dropout_rng=dec_rng)
    return logits, {"encoder_last_hidden_state": enc}
