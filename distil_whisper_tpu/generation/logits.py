"""Logits processors, XLA-native.

Pure functions over ``(scores [B, V], loop state)`` — the jit-safe counterpart
of HF's processor classes (semantics pinned to
``transformers.generation.logits_process`` and to the reference's
``FlaxStaticForceTokensLogitsProcessor``, modeling_flax_whisper.py:185-235).
All masking is vectorised with a vocab iota; no per-row Python.

The Whisper timestamp FSM state is three per-sample scalars carried by the
generation loop instead of re-scanning the token history every step:
``prev`` / ``prevprev`` (last two *generated* tokens) and ``last_ts`` (value of
the most recent timestamp token, 0 if none).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import WhisperConfig

NEG_INF = float("-inf")


def _vocab_iota(v: int) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)


def _cols(idx):
    """Normalise a scalar or per-lane [B] index so it broadcasts against
    [B, V] score tensors (the continuous-batching engine steps every lane at
    its own generation index; the classic loops pass one scalar)."""
    g = jnp.asarray(idx)
    return g[:, None] if g.ndim == 1 else g


def suppress_tokens(scores: jnp.ndarray,
                    token_ids: Sequence[int]) -> jnp.ndarray:
    """Unconditionally set the given token ids to -inf (HF SuppressTokens)."""
    if not token_ids:
        return scores
    mask = jnp.zeros((scores.shape[-1],), bool).at[jnp.asarray(token_ids)].set(True)
    return jnp.where(mask[None, :], NEG_INF, scores)


def suppress_tokens_at_begin(scores: jnp.ndarray, gen_idx,
                             token_ids: Sequence[int]) -> jnp.ndarray:
    """HF SuppressTokensAtBegin: only at the first generated position."""
    if not token_ids:
        return scores
    mask = jnp.zeros((scores.shape[-1],), bool).at[jnp.asarray(token_ids)].set(True)
    return jnp.where(jnp.logical_and(_cols(gen_idx) == 0, mask[None, :]),
                     NEG_INF, scores)


def force_tokens(scores: jnp.ndarray, gen_idx,
                 forced: Sequence[Tuple[int, int]],
                 prompt_len: int) -> jnp.ndarray:
    """Force specific tokens at absolute decoder positions.

    ``forced`` uses HF ``forced_decoder_ids`` convention: (position, token)
    with position counted from the start of the decoder sequence (position 0
    is the token *after* decoder_start).  Implemented as a fixed-shape id
    array indexed by the current position — the reference's XLA-safe trick
    (modeling_flax_whisper.py:185-235).
    """
    if not forced:
        return scores
    max_pos = max(p for p, _ in forced)
    table = [-1] * (max_pos + 1)
    for p, t in forced:
        table[p] = t
    table_arr = jnp.asarray(table, jnp.int32)
    # absolute position of the token being generated now (both terms may be
    # scalars or per-lane [B] arrays):
    pos = _cols(jnp.asarray(gen_idx) + jnp.asarray(prompt_len))
    tok = jnp.where(pos <= max_pos, table_arr[jnp.clip(pos, 0, max_pos)], -1)
    iota = _vocab_iota(scores.shape[-1])
    forced_scores = jnp.where(iota == tok, 0.0, NEG_INF)
    return jnp.where(tok >= 0, forced_scores, scores)


def min_new_tokens(scores: jnp.ndarray, gen_idx, min_tokens: int,
                   eos_token_id: int) -> jnp.ndarray:
    if min_tokens <= 0:
        return scores
    iota = _vocab_iota(scores.shape[-1])
    mask = jnp.logical_and(_cols(gen_idx) < min_tokens, iota == eos_token_id)
    return jnp.where(mask, NEG_INF, scores)


class TimestampState(NamedTuple):
    """Per-sample FSM state for the Whisper timestamp rules."""
    prev: jnp.ndarray       # [B] int32, last generated token (-1 if none)
    prevprev: jnp.ndarray   # [B] int32, second-to-last (-1 if none)
    last_ts: jnp.ndarray    # [B] int32, most recent timestamp token id (0 = none)

    @staticmethod
    def init(batch: int) -> "TimestampState":
        return TimestampState(
            prev=jnp.full((batch,), -1, jnp.int32),
            prevprev=jnp.full((batch,), -1, jnp.int32),
            last_ts=jnp.zeros((batch,), jnp.int32),
        )

    def update(self, token: jnp.ndarray, ts_begin: int) -> "TimestampState":
        token = token.astype(jnp.int32)
        is_ts = token >= ts_begin
        return TimestampState(
            prev=token,
            prevprev=self.prev,
            last_ts=jnp.where(is_ts, token, self.last_ts),
        )


def timestamp_rules(scores: jnp.ndarray, gen_idx, state: TimestampState,
                    cfg: WhisperConfig,
                    max_initial_timestamp_index: Optional[int] = 50,
                    detect_from_logprob: bool = True) -> jnp.ndarray:
    """WhisperTimeStampLogitsProcessor, vectorised.

    gen_idx: index within the generated region (0 = first sampled token);
    a scalar, or a per-lane [B] array when lanes sit at different indices.
    """
    b, v = scores.shape
    gen_idx = jnp.asarray(gen_idx)
    ts_begin = cfg.timestamp_begin
    eos = cfg.eos_token_id
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, v), 1)

    # 1. always suppress <|notimestamps|>
    scores = jnp.where(iota == cfg.no_timestamps_token_id, NEG_INF, scores)

    last_was = jnp.logical_and(gen_idx >= 1, state.prev >= ts_begin)       # [B]
    penult_was = jnp.logical_or(gen_idx < 2, state.prevprev >= ts_begin)  # [B]

    # 2. timestamps come in pairs
    force_text = jnp.logical_and(last_was, penult_was)[:, None]
    scores = jnp.where(jnp.logical_and(force_text, iota >= ts_begin),
                       NEG_INF, scores)
    force_ts_or_eos = jnp.logical_and(last_was, ~penult_was)[:, None]
    scores = jnp.where(jnp.logical_and(force_ts_or_eos, iota < eos),
                       NEG_INF, scores)

    # 3. non-decreasing timestamps
    has_ts = state.last_ts > 0
    bound = jnp.where(jnp.logical_and(last_was, ~penult_was),
                      state.last_ts, state.last_ts + 1)  # [B]
    ts_too_small = jnp.logical_and(iota >= ts_begin, iota < bound[:, None])
    scores = jnp.where(jnp.logical_and(has_ts[:, None], ts_too_small),
                       NEG_INF, scores)

    # 4. first generated token must be an (early) timestamp
    at_begin = _cols(gen_idx) == 0
    scores = jnp.where(jnp.logical_and(at_begin, iota < ts_begin), NEG_INF, scores)
    if max_initial_timestamp_index is not None:
        last_allowed = ts_begin + max_initial_timestamp_index
        scores = jnp.where(jnp.logical_and(at_begin, iota > last_allowed),
                           NEG_INF, scores)

    # 5. if total timestamp probability beats every text token, force timestamp
    if detect_from_logprob:
        logprobs = jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1)
        ts_mask = iota >= ts_begin
        ts_logprob = jax.nn.logsumexp(
            jnp.where(ts_mask, logprobs, NEG_INF), axis=-1)          # [B]
        max_text = jnp.max(jnp.where(ts_mask, NEG_INF, logprobs), axis=-1)
        force = (ts_logprob > max_text)[:, None]
        scores = jnp.where(jnp.logical_and(force, iota < ts_begin),
                           NEG_INF, scores)
    return scores
