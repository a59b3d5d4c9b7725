"""Jitted beam search (HF semantics: length-penalised, 2K candidate pool).

Completes the generation-mode surface the reference gets from HF ``generate``
(greedy/beam/sampling, SURVEY.md §2.6 — pseudo-labelling commonly runs beam
search).  One ``lax.while_loop``; the KV cache carries a flattened beam dim
and is re-gathered along it after every reorder.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..models.whisper import decode, init_cache, cross_kv, encode
from . import logits as L
from .generate import GenerationOptions, _process_scores

NEG_INF = float("-inf")


class BeamOutput(NamedTuple):
    sequences: jnp.ndarray   # [B, total] best finished beam
    seq_len: jnp.ndarray     # [B]
    scores: jnp.ndarray      # [B] length-penalised log-prob of the best beam
    # Parity fields so beam output can join the sequential fallback ladder and
    # no-speech gating exactly like greedy (HF returns these via
    # return_dict_in_generate; the reference PL runs beam + thresholds).
    sum_logprobs: jnp.ndarray    # [B] un-penalised sum log-prob incl. EOS
    no_speech_prob: jnp.ndarray  # [B] fp32 (zeros unless no_speech_token_id)


def _flat(x):
    b, k = x.shape[:2]
    return x.reshape((b * k,) + x.shape[2:])


def _unflat(x, b, k):
    return x.reshape((b, k) + x.shape[1:])


def beam_search(dec_params: Dict[str, Any], cfg: WhisperConfig,
                cross: Dict[str, Any], prompt_ids: jnp.ndarray,
                opts: GenerationOptions, num_beams: int = 5,
                length_penalty: float = 1.0,
                sot_slot: int = 0,
                pad_len=None,
                dtype=jnp.float32) -> BeamOutput:
    """HF-style beam search.  ``cross`` K/V are for batch B (expanded here).

    ``sot_slot``: prompt position of <|startoftranscript|> — 0 for plain
    prompts; for condition-on-prev prompts ([<|startofprev|>, prev..., SOT,
    ...]) pass the SOT index so no_speech_prob reads the right slot (the
    same convention as generate()'s ``sot_slot``).

    ``pad_len`` [B]: left-padded prompt support (the sequential long-form
    prompt layout) — pad slots are masked out of self-attention and positions
    shift per sample, exactly as in ``generate()``/``decode()``."""
    b, p = prompt_ids.shape
    k = num_beams
    total = p + opts.max_new_tokens
    assert total <= cfg.max_target_positions
    eos = cfg.eos_token_id
    vocab = cfg.vocab_size

    # expand cross K/V (either bf16 or int8+scale storage) and prompts to
    # the beam dim (batch axis is 1 for every cross field)
    cross_bk = {name: jnp.repeat(arr, k, axis=1)
                for name, arr in cross.items()}
    prompts_bk = jnp.repeat(prompt_ids.astype(jnp.int32), k, axis=0)
    pad_bk = (jnp.repeat(pad_len.astype(jnp.int32), k, axis=0)
              if pad_len is not None else None)

    cache = init_cache(cfg, b * k, dtype=dtype, max_len=total)
    prefill_logits, cache = decode(dec_params, cfg, prompts_bk,
                                   cross=cross_bk, cache=cache,
                                   pos_offset=0, pad_len=pad_bk, dtype=dtype)

    # <|nospeech|> probability at the SOT slot of beam 0 (same convention as
    # generate()).
    if opts.no_speech_token_id is not None:
        sot_logits = _unflat(prefill_logits, b, k)[:, 0, sot_slot]
        probs0 = jax.nn.softmax(sot_logits.astype(jnp.float32), -1)
        no_speech_prob = probs0[:, opts.no_speech_token_id]
    else:
        no_speech_prob = jnp.zeros((b,), jnp.float32)

    tokens = jnp.full((b, k, total), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, :, :p].set(prompt_ids[:, None, :])

    # only beam 0 is live initially (all beams identical)
    live_scores = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (b, k), 1) == 0, 0.0, NEG_INF)

    state = dict(
        tokens=tokens,
        live_scores=live_scores,
        fin_tokens=tokens,
        fin_scores=jnp.full((b, k), NEG_INF),
        fin_sum=jnp.full((b, k), NEG_INF),   # un-penalised sums
        fin_len=jnp.full((b, k), p, jnp.int32),
        cache=cache,
        last_logits=_unflat(prefill_logits[:, -1].astype(jnp.float32), b, k),
        ts=L.TimestampState.init(b * k),
        cur=jnp.asarray(p, jnp.int32),
    )

    def cond(s):
        # HF early_stopping=False heuristic: continue while the best live
        # beam, penalised at the current length, could still beat the worst
        # kept finished beam.
        pen = s["cur"].astype(jnp.float32) ** length_penalty
        max_live = jnp.max(s["live_scores"], axis=1) / pen
        min_fin = jnp.min(s["fin_scores"], axis=1)
        improvable = jnp.any(max_live > min_fin)
        return jnp.logical_and(s["cur"] < total, improvable)

    def body(s):
        gen_idx = s["cur"] - p
        # HF beam order: log_softmax first, processors applied to log-probs
        # without renormalisation.
        logp = jax.nn.log_softmax(_flat(s["last_logits"]), axis=-1)
        logp = _process_scores(logp, gen_idx, s["ts"], cfg, opts, p)
        cand = s["live_scores"][:, :, None] + _unflat(logp, b, k)  # [B,K,V]

        flat_cand = cand.reshape(b, k * vocab)
        top_scores, top_idx = jax.lax.top_k(flat_cand, 2 * k)  # [B, 2K]
        src_beam = top_idx // vocab
        tok = (top_idx % vocab).astype(jnp.int32)

        # gather candidate token rows (HF stores finished hypotheses WITHOUT
        # the eos token, length-penalised by the full sequence length)
        cand_tokens = jnp.take_along_axis(
            s["tokens"], src_beam[:, :, None], axis=1)          # [B, 2K, L]

        is_eos = tok == eos
        penalty = s["cur"].astype(jnp.float32) ** length_penalty
        fin_cand_scores = jnp.where(is_eos, top_scores / penalty, NEG_INF)

        # merge finished candidates into the finished set (keep top K)
        all_fin_scores = jnp.concatenate([s["fin_scores"], fin_cand_scores], 1)
        all_fin_sum = jnp.concatenate(
            [s["fin_sum"], jnp.where(is_eos, top_scores, NEG_INF)], 1)
        all_fin_tokens = jnp.concatenate([s["fin_tokens"], cand_tokens], 1)
        all_fin_len = jnp.concatenate(
            [s["fin_len"], jnp.full((b, 2 * k), s["cur"], jnp.int32)], 1)
        fin_top, fin_idx = jax.lax.top_k(all_fin_scores, k)
        fin_tokens = jnp.take_along_axis(all_fin_tokens, fin_idx[:, :, None], 1)
        fin_sum = jnp.take_along_axis(all_fin_sum, fin_idx, 1)
        fin_len = jnp.take_along_axis(all_fin_len, fin_idx, 1)

        # live beams: best K non-eos candidates
        live_cand = jnp.where(is_eos, NEG_INF, top_scores)
        live_top, live_idx = jax.lax.top_k(live_cand, k)      # [B, K]
        live_beam_src = jnp.take_along_axis(src_beam, live_idx, 1)
        live_tok = jnp.take_along_axis(tok, live_idx, 1)
        tokens = jnp.take_along_axis(
            s["tokens"], live_beam_src[:, :, None], axis=1)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, live_tok[:, :, None], s["cur"], axis=2)

        # reorder the cache + FSM state along the beam dim
        flat_src = (jax.lax.broadcasted_iota(jnp.int32, (b, k), 0) * k
                    + live_beam_src).reshape(-1)
        cache = jax.tree.map(lambda x: jnp.take(x, flat_src, axis=1),
                             s["cache"])
        ts = L.TimestampState(*(jnp.take(f, flat_src, axis=0)
                                for f in s["ts"]))
        ts = ts.update(live_tok.reshape(-1), cfg.timestamp_begin)

        lg, cache = decode(dec_params, cfg, live_tok.reshape(-1, 1),
                           cross=cross_bk, cache=cache,
                           pos_offset=s["cur"], pad_len=pad_bk, dtype=dtype)

        return dict(tokens=tokens, live_scores=live_top,
                    fin_tokens=fin_tokens, fin_scores=fin_top,
                    fin_sum=fin_sum, fin_len=fin_len, cache=cache,
                    last_logits=_unflat(lg[:, -1].astype(jnp.float32), b, k),
                    ts=ts, cur=s["cur"] + 1)

    state = jax.lax.while_loop(cond, body, state)

    # fall back to the best live beam when nothing finished
    live_pen = state["cur"].astype(jnp.float32) ** length_penalty
    live_final = state["live_scores"] / jnp.maximum(live_pen, 1.0)
    no_fin = jnp.all(state["fin_scores"] == NEG_INF, axis=1, keepdims=True)
    fin_scores = jnp.where(no_fin, live_final, state["fin_scores"])
    fin_sum = jnp.where(no_fin, state["live_scores"], state["fin_sum"])
    fin_tokens = jnp.where(no_fin[:, :, None], state["tokens"],
                           state["fin_tokens"])
    fin_len = jnp.where(no_fin, state["cur"], state["fin_len"])

    best = jnp.argmax(fin_scores, axis=1)
    sequences = jnp.take_along_axis(fin_tokens, best[:, None, None], 1)[:, 0]
    seq_len = jnp.take_along_axis(fin_len, best[:, None], 1)[:, 0]
    scores = jnp.take_along_axis(fin_scores, best[:, None], 1)[:, 0]
    sum_logprobs = jnp.take_along_axis(fin_sum, best[:, None], 1)[:, 0]
    iota = jax.lax.broadcasted_iota(jnp.int32, sequences.shape, 1)
    sequences = jnp.where(iota < seq_len[:, None], sequences,
                          cfg.pad_token_id)
    return BeamOutput(sequences=sequences, seq_len=seq_len, scores=scores,
                      sum_logprobs=sum_logprobs.astype(jnp.float32),
                      no_speech_prob=no_speech_prob)


def encode_and_beam_search(params, cfg: WhisperConfig, mel, prompt_ids,
                           opts: GenerationOptions, num_beams: int = 5,
                           length_penalty: float = 1.0, sot_slot: int = 0,
                           pad_len=None, dtype=jnp.float32):
    enc = encode(params["encoder"], cfg, mel, dtype=dtype)
    cross = cross_kv(params["decoder"], cfg, enc)
    return beam_search(params["decoder"], cfg, cross, prompt_ids, opts,
                       num_beams=num_beams, length_penalty=length_penalty,
                       sot_slot=sot_slot, pad_len=pad_len, dtype=dtype)
