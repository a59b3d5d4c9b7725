"""Jitted autoregressive generation (greedy + sampling) with Whisper rules.

Replaces the HF Flax generation loop the reference leans on
(modeling_flax_whisper.py:1977-2067): one ``lax.while_loop`` with a static
token budget, a static-shape KV cache, and the vocabulary-masked processor
stack from :mod:`.logits`.  Temperature is a *traced* scalar so the sequential
long-form fallback ladder (0.0, 0.2, ..., 1.0 — reference
training/run_eval.py:712-718) re-uses one compiled sampling program.

Everything returned is fixed-shape; host-side code slices with ``seq_len``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..models.whisper import decode, init_cache, cross_kv, encode
from . import logits as L


@dataclasses.dataclass(frozen=True)
class GenerationOptions:
    """Static (compile-time) generation settings."""
    max_new_tokens: int = 128
    min_new_tokens: int = 0
    do_sample: bool = False
    top_k: int = 0                       # 0 = no top-k filtering
    return_timestamps: bool = False
    max_initial_timestamp_index: Optional[int] = 50
    suppress_tokens: Tuple[int, ...] = ()
    begin_suppress_tokens: Tuple[int, ...] = ()
    forced_decoder_ids: Tuple[Tuple[int, int], ...] = ()
    no_speech_token_id: Optional[int] = None

    @classmethod
    def from_config(cls, cfg: WhisperConfig, **kw) -> "GenerationOptions":
        defaults = dict(suppress_tokens=tuple(cfg.suppress_tokens),
                        begin_suppress_tokens=tuple(cfg.begin_suppress_tokens),
                        forced_decoder_ids=tuple(cfg.forced_decoder_ids))
        defaults.update(kw)
        return cls(**defaults)


class GenerateOutput(NamedTuple):
    sequences: jnp.ndarray      # [B, prompt+max_new] int32, pad after EOS
    seq_len: jnp.ndarray        # [B] total length incl. prompt and EOS
    sum_logprobs: jnp.ndarray   # [B] fp32 sum over generated tokens (incl. EOS)
    no_speech_prob: jnp.ndarray  # [B] fp32 (zeros unless no_speech_token_id set)


def _process_scores(scores, gen_idx, ts_state, cfg: WhisperConfig,
                    opts: GenerationOptions, prompt_len: int):
    scores = L.force_tokens(scores, gen_idx, opts.forced_decoder_ids, prompt_len)
    scores = L.suppress_tokens_at_begin(scores, gen_idx, opts.begin_suppress_tokens)
    scores = L.suppress_tokens(scores, opts.suppress_tokens)
    scores = L.min_new_tokens(scores, gen_idx, opts.min_new_tokens,
                              cfg.eos_token_id)
    if opts.return_timestamps:
        scores = L.timestamp_rules(scores, gen_idx, ts_state, cfg,
                                   opts.max_initial_timestamp_index)
    return scores


def _select(scores, temperature, rng, opts: GenerationOptions):
    """Greedy or temperature sampling over processed scores."""
    if not opts.do_sample:
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)
    s = scores.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    if opts.top_k > 0:
        kth = jax.lax.top_k(s, opts.top_k)[0][:, -1:]
        s = jnp.where(s < kth, L.NEG_INF, s)
    return jax.random.categorical(rng, s, axis=-1).astype(jnp.int32)


def generate(dec_params: Dict[str, Any], cfg: WhisperConfig,
             cross: Dict[str, Any], prompt_ids: jnp.ndarray,
             opts: GenerationOptions,
             temperature=0.0,
             rng: Optional[jax.Array] = None,
             pad_len: Optional[jnp.ndarray] = None,
             sot_slot: Optional[int] = None,
             dtype=jnp.float32) -> GenerateOutput:
    """Autoregressively extend ``prompt_ids`` [B, P] by up to max_new_tokens.

    ``cross`` is the precomputed cross-attention K/V (:func:`...models.cross_kv`).
    The prompt must already contain decoder_start/lang/task tokens (the modern
    HF convention); ``opts.forced_decoder_ids`` is also honoured for parity
    with the reference's ``pipeline_generate``.

    ``pad_len`` [B] marks left-padded prompt slots (condition-on-prev prompts
    of varying length share one compiled program; cf. models.whisper.decode).
    """
    b, p = prompt_ids.shape
    total = p + opts.max_new_tokens
    assert total <= cfg.max_target_positions, (
        f"prompt({p}) + max_new({opts.max_new_tokens}) exceeds "
        f"{cfg.max_target_positions}")
    if rng is None:
        rng = jax.random.PRNGKey(0)

    prompt_ids = prompt_ids.astype(jnp.int32)
    cache = init_cache(cfg, b, dtype=dtype, max_len=total)
    prefill_logits, cache = decode(dec_params, cfg, prompt_ids, cross=cross,
                                   cache=cache, pos_offset=0, pad_len=pad_len,
                                   dtype=dtype)

    # <|nospeech|> probability from the raw logits at the SOT position
    # (HF WhisperNoSpeechDetection / OpenAI sot_index convention).  With a
    # left-padded condition-on-prev prompt the <|startoftranscript|> slot is
    # static: prompt_len - len(base_prompt) — pass it as ``sot_slot``.
    if opts.no_speech_token_id is not None:
        if sot_slot is not None:
            sot_logits = prefill_logits[:, sot_slot]
        elif pad_len is None:
            sot_logits = prefill_logits[:, 0]
        else:
            sot_logits = jnp.take_along_axis(
                prefill_logits, pad_len.astype(jnp.int32)[:, None, None], axis=1
            )[:, 0]
        probs0 = jax.nn.softmax(sot_logits.astype(jnp.float32), -1)
        no_speech_prob = probs0[:, opts.no_speech_token_id]
    else:
        no_speech_prob = jnp.zeros((b,), jnp.float32)

    tokens = jnp.full((b, total), cfg.pad_token_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids, (0, 0))

    state = dict(
        tokens=tokens,
        cache=cache,
        last_logits=prefill_logits[:, -1].astype(jnp.float32),
        ts=L.TimestampState.init(b),
        finished=jnp.zeros((b,), bool),
        sum_logprobs=jnp.zeros((b,), jnp.float32),
        seq_len=jnp.full((b,), p, jnp.int32),
        cur=jnp.asarray(p, jnp.int32),
        rng=rng,
    )

    def cond(s):
        return jnp.logical_and(s["cur"] < total, ~jnp.all(s["finished"]))

    def body(s):
        gen_idx = s["cur"] - p
        scores = _process_scores(s["last_logits"], gen_idx, s["ts"], cfg,
                                 opts, p)
        rng, step_rng = jax.random.split(s["rng"])
        nxt = _select(scores, temperature, step_rng, opts)

        logp = jax.nn.log_softmax(scores, axis=-1)
        tok_logp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]

        was_finished = s["finished"]
        nxt = jnp.where(was_finished, cfg.pad_token_id, nxt)
        sum_logprobs = s["sum_logprobs"] + jnp.where(was_finished, 0.0, tok_logp)
        finished = jnp.logical_or(was_finished, nxt == cfg.eos_token_id)
        seq_len = jnp.where(was_finished, s["seq_len"], s["cur"] + 1)

        tokens = jax.lax.dynamic_update_slice(s["tokens"], nxt[:, None],
                                              (0, s["cur"]))
        ts = s["ts"].update(nxt, cfg.timestamp_begin)

        # Next-step logits. Decoded UNconditionally: a lax.cond would have to
        # merge the KV cache from both branches (risking a whole-cache copy
        # every step) to save exactly one decode per utterance — the final
        # step's logits are simply never read.
        lg, cache = decode(dec_params, cfg, nxt[:, None], cross=cross,
                           cache=s["cache"], pos_offset=s["cur"],
                           pad_len=pad_len, dtype=dtype)
        last_logits = lg[:, -1].astype(jnp.float32)

        return dict(tokens=tokens, cache=cache, last_logits=last_logits,
                    ts=ts, finished=finished, sum_logprobs=sum_logprobs,
                    seq_len=seq_len, cur=s["cur"] + 1, rng=rng)

    state = jax.lax.while_loop(cond, body, state)
    return GenerateOutput(sequences=state["tokens"], seq_len=state["seq_len"],
                          sum_logprobs=state["sum_logprobs"],
                          no_speech_prob=no_speech_prob)


# ----------------------------------------------------------------------
# Convenience wrappers
# ----------------------------------------------------------------------


def encode_and_generate(params: Dict[str, Any], cfg: WhisperConfig,
                        mel: jnp.ndarray, prompt_ids: jnp.ndarray,
                        opts: GenerationOptions, temperature=0.0,
                        rng: Optional[jax.Array] = None,
                        pad_len: Optional[jnp.ndarray] = None,
                        sot_slot: Optional[int] = None,
                        dtype=jnp.float32) -> GenerateOutput:
    """mel [B, n_mels, 3000] + prompt -> GenerateOutput (one jittable fn)."""
    enc = encode(params["encoder"], cfg, mel, dtype=dtype)
    cross = cross_kv(params["decoder"], cfg, enc)
    return generate(params["decoder"], cfg, cross, prompt_ids, opts,
                    temperature=temperature, rng=rng, pad_len=pad_len,
                    sot_slot=sot_slot, dtype=dtype)


def build_generate(cfg: WhisperConfig, opts: GenerationOptions, dtype=jnp.float32):
    """Return a jitted ``(params, mel, prompt_ids, temperature, rng) -> out``."""
    def fn(params, mel, prompt_ids, temperature, rng):
        return encode_and_generate(params, cfg, mel, prompt_ids, opts,
                                   temperature=temperature, rng=rng, dtype=dtype)
    return jax.jit(fn)
