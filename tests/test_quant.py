"""int8 W8A8 quantization parity (ops/quant.py).

The int8 encoder is an opt-in approximate inference mode — these tests bound
its numeric drift at every granularity so a regression in the quantization
math (scale placement, axis choice, epilogue order) is caught structurally:

* weight round-trip: dequantized int8 weights within 1/127 per-channel absmax
* dense_int8 vs exact dense: relative error on realistic activation shapes
* full encode() quantized vs exact: cosine similarity + bounded rel error
* fused Pallas path (interpret mode) vs einsum path under quantization
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distil_whisper_tpu.config import PRESETS
from distil_whisper_tpu.models import init_params
from distil_whisper_tpu.models.whisper import dense, encode
from distil_whisper_tpu.ops.quant import (quantize_weight, quantize_acts,
                                          quantize_dense, dense_int8,
                                          quantize_encoder_params,
                                          maybe_quantize_encoder)


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_weight_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((96, 64)), jnp.float32)
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 64)
    deq = q.astype(jnp.float32) * s
    # absolute error per element <= scale/2 = absmax/254 per channel
    bound = np.asarray(s)[0] / 2 + 1e-7
    assert (np.abs(np.asarray(deq - w)) <= bound[None, :]).all()


def test_stacked_weight_quantization_per_layer():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((3, 32, 16)), jnp.float32)
    w = w * jnp.asarray([1.0, 10.0, 0.1])[:, None, None]  # distinct ranges
    q, s = quantize_weight(w)
    assert s.shape == (3, 1, 16)
    deq = q.astype(jnp.float32) * s
    assert _rel_err(deq, w) < 0.006


def test_acts_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 7, 48)), jnp.float32)
    q, s = quantize_acts(x)
    assert q.dtype == jnp.int8 and s.shape == (4, 7, 1)
    assert _rel_err(q.astype(jnp.float32) * s, x) < 0.01


def test_dense_int8_matches_dense():
    rng = np.random.default_rng(3)
    p = {"kernel": jnp.asarray(rng.standard_normal((64, 96)), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(96), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((2, 10, 64)), jnp.float32)
    exact = dense(p, x)
    approx = dense_int8(quantize_dense(p), x)
    assert _rel_err(approx, exact) < 0.02
    assert _cos(approx, exact) > 0.999


def test_dense_dispatches_on_structure():
    rng = np.random.default_rng(4)
    p = {"kernel": jnp.asarray(rng.standard_normal((32, 32)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((5, 32)), jnp.float32)
    out = dense(quantize_dense(p), x)          # routed through dense_int8
    assert _rel_err(out, dense(p, x)) < 0.02


def test_encode_quantized_parity():
    cfg = PRESETS["test-tiny"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 3000)) * 0.5,
                      jnp.float32)
    exact = encode(params["encoder"], cfg, mel)
    qenc = quantize_encoder_params(params["encoder"])
    approx = encode(qenc, cfg, mel)
    assert _cos(approx, exact) > 0.999
    assert _rel_err(approx, exact) < 0.03
    # idempotent + full-tree helper honours the flag
    assert quantize_encoder_params(qenc) is qenc
    assert maybe_quantize_encoder(params, cfg) is params
    qtree = maybe_quantize_encoder(params, cfg.replace(quantize_encoder=True))
    assert "kernel_q" in qtree["encoder"]["layers"]["fc1"]


@pytest.mark.parametrize("deep", [False, True])
def test_quantized_self_cache_decode_parity(deep):
    """Cached decode with the int8 self-KV cache must track the exact cache
    closely over a multi-step generation (both the unrolled shallow branch
    and the carry-cache deep branch)."""
    from distil_whisper_tpu.models.whisper import decode, init_cache, cross_kv

    cfg = PRESETS["test-tiny"]
    if deep:
        cfg = cfg.replace(decoder_layers=5)  # > 4 -> carry-cache branch
    params = init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(7)
    b, t_enc = 2, 1500
    enc = jnp.asarray(rng.standard_normal((b, t_enc, cfg.d_model)) * 0.3,
                      jnp.float32)
    cross = cross_kv(params["decoder"], cfg, enc)
    toks = jnp.asarray(rng.integers(0, 100, (b, 1)), jnp.int32)

    cache_ex = init_cache(cfg, b, max_len=8, quantize=False)
    cache_q = init_cache(cfg, b, max_len=8, quantize=True)
    assert cache_q["k_q"].dtype == jnp.int8
    for step in range(4):
        lg_ex, cache_ex = decode(params["decoder"], cfg, toks, cross=cross,
                                 cache=cache_ex, pos_offset=step)
        lg_q, cache_q = decode(params["decoder"], cfg, toks, cross=cross,
                               cache=cache_q, pos_offset=step)
        assert _cos(lg_q, lg_ex) > 0.9999
        toks = jnp.argmax(lg_ex[:, -1:], axis=-1).astype(jnp.int32)
    # cache contents round-trip: dequantized K equals exact K closely
    deq_k = (cache_q["k_q"].astype(jnp.float32)
             * cache_q["k_scale"][..., None])
    assert _rel_err(deq_k[:, :, :4], cache_ex["k"][:, :, :4]) < 0.01


def test_fused_int8_mlp_matches_unfused(monkeypatch=None):
    """Pallas fused int8 MLP (interpret mode) vs the dense_int8 + gelu +
    dense_int8 composition: same quantized weights, near-identical output
    (per-(row,chunk) activation scales are finer, so only the activation
    requantization differs)."""
    from distil_whisper_tpu.models.whisper import mlp_block
    from distil_whisper_tpu.ops.int8_mlp import fused_int8_mlp, mlp_supported

    rng = np.random.default_rng(8)
    d, f, m = 256, 1024, 40
    fc1 = quantize_dense({
        "kernel": jnp.asarray(rng.standard_normal((d, f)) * 0.05,
                              jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(f) * 0.01, jnp.float32)})
    fc2 = quantize_dense({
        "kernel": jnp.asarray(rng.standard_normal((f, d)) * 0.05,
                              jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(d) * 0.01, jnp.float32)})
    x = jnp.asarray(rng.standard_normal((2, m // 2, d)), jnp.float32)
    # the automatic dispatch requires encoder-scale row counts (>=256);
    # single-token decode rows stay on dense_int8
    assert not mlp_supported(fc1, x, chunk_f=512)
    assert mlp_supported(fc1, jnp.zeros((2, 200, d)), chunk_f=512)

    fused = fused_int8_mlp(fc1, fc2, x, chunk_f=512, interpret=True)
    unfused = mlp_block(fc1, fc2, x)   # dense_int8 path off-TPU
    assert fused.shape == x.shape
    assert _rel_err(fused, unfused) < 0.02
    # and both near the exact fp32 MLP
    fc1_e = {"kernel": fc1["kernel_q"].astype(jnp.float32)
             * fc1["kernel_scale"], "bias": fc1["bias"]}
    fc2_e = {"kernel": fc2["kernel_q"].astype(jnp.float32)
             * fc2["kernel_scale"], "bias": fc2["bias"]}
    exact = mlp_block(fc1_e, fc2_e, x)
    assert _cos(fused, exact) > 0.999


def test_quantized_decoder_generate_parity():
    """int8 decoder projections through the REAL cached generate loop:
    greedy sequences must closely track the exact decoder on a tiny model
    (autoregressive drift bounded), and the tree transform must leave
    embeddings/LNs untouched."""
    from distil_whisper_tpu.ops.quant import (quantize_decoder_params,
                                              maybe_quantize_encoder)
    from distil_whisper_tpu.generation import (GenerationOptions,
                                               encode_and_generate)

    cfg = PRESETS["test-tiny"].replace(max_target_positions=64)
    params = init_params(cfg, jax.random.PRNGKey(3))
    qdec = quantize_decoder_params(params["decoder"])
    assert "kernel_q" in qdec["layers"]["self_attn"]["q"]
    assert "kernel_q" in qdec["layers"]["cross_attn"]["out"]
    assert "kernel" not in qdec["layers"]["fc2"]
    assert qdec["tok_emb"] is params["decoder"]["tok_emb"]
    assert quantize_decoder_params(qdec) is qdec  # idempotent
    qtree = maybe_quantize_encoder(params,
                                   cfg.replace(quantize_decoder=True))
    assert "kernel_q" in qtree["decoder"]["layers"]["fc1"]
    assert "kernel" in qtree["encoder"]["layers"]["fc1"]  # encoder untouched

    rng = np.random.default_rng(10)
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 3000)) * 0.5,
                      jnp.float32)
    prompts = jnp.full((2, 1), cfg.decoder_start_token_id, jnp.int32)
    opts = GenerationOptions(max_new_tokens=12, min_new_tokens=12)
    exact = encode_and_generate(params, cfg, mel, prompts, opts)
    q = encode_and_generate(qtree, cfg, mel, prompts, opts)
    ex_seq = np.asarray(exact.sequences)
    q_seq = np.asarray(q.sequences)
    # random tiny models have near-uniform logits, so exact token equality
    # is not guaranteed — require the large majority of steps to agree
    agree = (ex_seq == q_seq).mean()
    assert agree >= 0.75, (agree, ex_seq, q_seq)


def test_quantized_lm_head_logits_parity():
    """int8 logits matmul (quantize_lm_head): logits must track the exact
    tied-embedding projection within W8A8 bounds, the input-embedding
    lookup must stay EXACT (it keeps the bf16 table), and generate must
    closely track the exact model."""
    from distil_whisper_tpu.ops.quant import (quantize_lm_head_params,
                                              maybe_quantize_encoder)
    from distil_whisper_tpu.models.whisper import decode, encode
    from distil_whisper_tpu.generation import (GenerationOptions,
                                               encode_and_generate)

    cfg = PRESETS["test-tiny"].replace(max_target_positions=64)
    params = init_params(cfg, jax.random.PRNGKey(4))
    qdec = quantize_lm_head_params(params["decoder"])
    assert qdec["tok_emb_q"].dtype == jnp.int8
    assert qdec["tok_emb"] is params["decoder"]["tok_emb"]  # lookup exact
    assert quantize_lm_head_params(qdec) is qdec  # idempotent

    rng = np.random.default_rng(11)
    # batch 8: the int8 lm-head path is gated on b >= 8 (bs1 GEMV loses)
    mel = jnp.asarray(rng.standard_normal((8, cfg.num_mel_bins, 3000)) * 0.5,
                      jnp.float32)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 7)), jnp.int32)
    enc = encode(params["encoder"], cfg, mel)
    exact, _ = decode(params["decoder"], cfg, toks, enc=enc)
    q, _ = decode(qdec, cfg, toks, enc=enc)
    ex = np.asarray(exact)
    qq = np.asarray(q)
    # per-position argmax must essentially always agree; logit drift is
    # bounded relative to the logit scale
    agree = (ex.argmax(-1) == qq.argmax(-1)).mean()
    assert agree >= 0.9, agree
    scale = np.abs(ex).max()
    assert np.abs(qq - ex).max() / scale < 0.05

    # below the gate the quantized tree must fall back to the EXACT path
    small, _ = decode(qdec, cfg, toks[:2], enc=enc[:2])
    np.testing.assert_allclose(np.asarray(small), ex[:2], rtol=1e-5,
                               atol=1e-5)

    qtree = maybe_quantize_encoder(params, cfg.replace(quantize_lm_head=True))
    prompts = jnp.full((8, 1), cfg.decoder_start_token_id, jnp.int32)
    opts = GenerationOptions(max_new_tokens=12, min_new_tokens=12)
    e_out = encode_and_generate(params, cfg, mel, prompts, opts)
    q_out = encode_and_generate(qtree, cfg, mel, prompts, opts)
    agree = (np.asarray(e_out.sequences) == np.asarray(q_out.sequences)).mean()
    assert agree >= 0.75, agree


def test_beam_search_with_quantized_self_cache():
    """Beam search reorders the cache along the beam dim every step; the
    quantized cache (int8 values + scale arrays) must reorder coherently —
    beam output with int8 self-KV must track the exact-cache beam output."""
    from distil_whisper_tpu.generation import (GenerationOptions,
                                               encode_and_beam_search)

    cfg = PRESETS["test-tiny"].replace(max_target_positions=64)
    params = init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(9)
    mel = jnp.asarray(rng.standard_normal((2, cfg.num_mel_bins, 3000)) * 0.5,
                      jnp.float32)
    prompts = jnp.full((2, 1), cfg.decoder_start_token_id, jnp.int32)
    opts = GenerationOptions(max_new_tokens=16)
    exact = encode_and_beam_search(params, cfg, mel, prompts, opts,
                                   num_beams=2)
    q = encode_and_beam_search(params, cfg.replace(quantize_self_kv=True),
                               mel, prompts, opts, num_beams=2)
    # scores drift only by quantization noise; sequences usually identical
    # on a 16-token tiny-model decode — require score closeness and shape
    # contract, and warn-level equality on tokens
    np.testing.assert_allclose(np.asarray(q.scores), np.asarray(exact.scores),
                               rtol=0.05, atol=0.05)
    assert q.sequences.shape == exact.sequences.shape
    assert (np.asarray(q.seq_len) > 1).all()


def test_fused_attention_int8_matches_einsum_int8():
    """The Pallas-path int8 projections (interpret mode on CPU) must agree
    with the einsum-path int8 projections (same quantization, same math)."""
    from distil_whisper_tpu.ops.encoder_attention import fused_self_attention
    from distil_whisper_tpu.models.whisper import attention_block

    n_heads, d, t, b = 4, 64, 128, 2
    rng = np.random.default_rng(6)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)

    p = {n: {"kernel": mk((d, d)), "bias": mk((d,))}
         for n in ("q", "k", "v", "out")}
    pq = {n: quantize_dense(p[n]) for n in p}
    x = mk((b, t, d))
    fused = fused_self_attention(pq, x, n_heads, t, interpret=True)
    ref = attention_block(pq, x, x, n_heads)
    assert _rel_err(fused, ref) < 0.02
    # and both stay close to the unquantized exact attention
    exact = attention_block(p, x, x, n_heads)
    assert _cos(fused, exact) > 0.998
