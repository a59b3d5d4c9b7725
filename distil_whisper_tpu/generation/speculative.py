"""Speculative decoding: distil draft proposes, teacher verifies.

The reference gets this from HF assisted generation (``assistant_model``,
reference training/run_eval.py:578-599; identical-outputs assertion at
flax/run_speculative_decoding.py:101-116).  Greedy acceptance: the draft
proposes ``gamma`` tokens autoregressively; the teacher scores all of them in
ONE decode; the longest matching prefix plus the teacher's own next token are
accepted.  Output is therefore *identical* to teacher-only greedy decoding —
the speedup comes from the teacher running one (gamma+1)-token decode per
~(n_accepted+1) tokens emitted.

TPU design: the whole accept/verify loop is a single ``lax.while_loop``
(traced cursor, fixed-shape caches, stale cache entries proven overwritten
before read by the causality argument in the loop body), so there is no
host round-trip per token.  Both models may share encoder states: a distil
draft is just a 2-layer decoder on the teacher's ``cross_kv``.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..models.whisper import decode, init_cache
from . import logits as L
from .generate import GenerationOptions


class SpeculativeOutput(NamedTuple):
    sequences: jnp.ndarray   # [1, total]
    seq_len: jnp.ndarray     # [1]
    rounds: jnp.ndarray      # number of verify rounds executed
    drafted: jnp.ndarray     # total draft tokens proposed
    accepted: jnp.ndarray    # total draft tokens accepted
    sum_logprobs: jnp.ndarray = None    # [1] fp32, generated tokens incl. EOS
    no_speech_prob: jnp.ndarray = None  # [1] fp32 (zeros unless requested)


def _process(scores, gen_idx, cfg, opts, prompt_len, ts_state=None):
    """The same processor stack, in the same order, as
    generate._process_scores — token identity with the greedy path depends
    on it.  ``ts_state`` is the timestamp FSM state for THIS position's
    context (required iff opts.return_timestamps)."""
    scores = L.force_tokens(scores, gen_idx, opts.forced_decoder_ids, prompt_len)
    scores = L.suppress_tokens_at_begin(scores, gen_idx, opts.begin_suppress_tokens)
    scores = L.suppress_tokens(scores, opts.suppress_tokens)
    scores = L.min_new_tokens(scores, gen_idx, opts.min_new_tokens,
                              cfg.eos_token_id)
    if opts.return_timestamps:
        scores = L.timestamp_rules(scores, gen_idx, ts_state, cfg,
                                   opts.max_initial_timestamp_index)
    return scores


def _bias_to(scores, target_tok):
    """Force argmax(scores) == target_tok WITHOUT severing the data
    dependence on the computed logits: overriding the token choice
    directly would make every model forward pass dead code, and XLA
    would eliminate the whole thing (docs/PERFORMANCE.md measurement
    rule 3 — an early draft of this mode 'ran' 256 tokens in 27 ms).
    Clamp + scale keeps |scores| <= 1e-4, the +1e6 one-hot dominates."""
    v = scores.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (v,), 0)
    bias = jnp.where(iota == target_tok, 1e6, 0.0)
    return jnp.maximum(scores, -1e5) * 1e-9 + bias


def _teacher_choices(t_logits, cur, p, gamma, cfg, opts, bias_fn=None,
                     ts_state=None, drafts=None):
    """Teacher argmax + chosen-token logprob per verify column (column i
    predicts absolute position cur + i); ``bias_fn(scores, abs_pos)`` is the
    benchmark-only synthetic-token override.

    Timestamp composition: column i's FSM state is the carried state (valid
    through position cur-1) advanced through ``drafts[:i]`` — exactly the
    context the column's output is conditioned on.  Columns past the first
    draft mismatch use a counterfactual state, but their outputs are
    discarded by ``_verify_accept`` in precisely those rounds, so every
    EMITTED token saw the same FSM state the sequential greedy loop would
    have applied (tests pin token identity vs timestamped ``generate``).

    Returns ``(choices [gamma+1] int32, logps [gamma+1] fp32)`` — the logp
    of the chosen token under the processed distribution, matching
    ``generate``'s ``sum_logprobs`` accounting for accepted columns."""
    cols, lps = [], []
    col_ts = ts_state
    for i in range(gamma + 1):
        sc = _process(t_logits[:, i].astype(jnp.float32), cur + i - p,
                      cfg, opts, p, ts_state=col_ts)
        if bias_fn is not None:
            sc = bias_fn(sc, cur + i)
        ch = jnp.argmax(sc, axis=-1)[0]
        lps.append(jax.nn.log_softmax(sc, axis=-1)[0, ch])
        cols.append(ch)
        if col_ts is not None and i < gamma:
            col_ts = col_ts.update(drafts[i][None], cfg.timestamp_begin)
    return (jnp.stack(cols).astype(jnp.int32),   # [gamma+1]
            jnp.stack(lps).astype(jnp.float32))  # [gamma+1]


def _ts_advance(ts, window, n_eff, ts_begin):
    """Advance a [1]-batch TimestampState past one emitted verify window
    (``window[0 .. n_eff]`` inclusive) in one shot — equivalent to n_eff+1
    sequential ``TimestampState.update`` calls."""
    idx = jax.lax.broadcasted_iota(jnp.int32, window.shape, 0)
    emitted = idx <= n_eff
    prev = jnp.take(window, n_eff)
    prevprev = jnp.where(n_eff >= 1,
                         jnp.take(window, jnp.maximum(n_eff - 1, 0)),
                         ts.prev[0])
    is_ts = jnp.logical_and(emitted, window >= ts_begin)
    ts_pos = jnp.max(jnp.where(is_ts, idx, -1))
    last_ts = jnp.where(ts_pos >= 0,
                        jnp.take(window, jnp.maximum(ts_pos, 0)),
                        ts.last_ts[0])
    return L.TimestampState(prev=prev[None].astype(jnp.int32),
                            prevprev=prevprev[None].astype(jnp.int32),
                            last_ts=last_ts[None].astype(jnp.int32))


def _verify_accept(t_choice, drafts, cur, total, eos, gamma):
    """Longest-matching-prefix acceptance (shared by the draft-model and
    n-gram proposers — correctness never depends on WHAT was proposed,
    every emitted token is the teacher's own choice).  Returns the
    (gamma+1)-token window to write at ``cur``, the number of accepted
    draft tokens, and the finished flag (EOS inside the window or budget
    exhausted)."""
    matches = (drafts == t_choice[:gamma])
    n = jnp.sum(jnp.cumprod(matches.astype(jnp.int32)))  # accepted drafts
    candidate = jnp.concatenate([drafts, t_choice[gamma:]])  # [gamma+1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (gamma + 1,), 0)
    accepted_vec = jnp.where(idx == n, t_choice, candidate)
    # EOS inside the accepted window ends the sequence early.
    in_window = idx <= n
    is_eos = jnp.logical_and(accepted_vec == eos, in_window)
    eos_idx = jnp.min(jnp.where(is_eos, idx, gamma + 1))
    n_eff = jnp.minimum(n, eos_idx)
    finished = jnp.logical_or(jnp.any(is_eos), cur + n_eff + 1 >= total)
    return accepted_vec, n_eff, finished


def speculative_generate(
        teacher_dec: Dict[str, Any], teacher_cfg: WhisperConfig,
        draft_dec: Dict[str, Any], draft_cfg: WhisperConfig,
        teacher_cross: Dict[str, Any], draft_cross: Dict[str, Any],
        prompt_ids: jnp.ndarray, opts: GenerationOptions,
        gamma: int = 5, dtype=jnp.float32,
        synthetic_acceptance: float = None,
        synthetic_seed: int = 0,
        pad_len=None, sot_slot=None) -> SpeculativeOutput:
    """Greedy speculative decoding, batch 1 (the reference's regime —
    'low batch sizes', README.md:425-427).

    ``opts.return_timestamps`` composes: the Whisper timestamp FSM runs
    per verify COLUMN, each column's state advanced through the draft
    tokens it is conditioned on (see :func:`_teacher_choices`) — the FSM
    is sequential over tokens but the verify round scores all gamma+1
    positions in one decode, so speculation keeps its shape.  The
    reference reaches the same composition through HF assisted generation,
    which re-runs the full logits-processor stack per verified position
    (reference training/run_eval.py:706-735).  Output remains
    token-identical to timestamped greedy ``generate``.

    ``pad_len`` ([1] int32) marks left-padded prompt slots and ``sot_slot``
    the static <|startoftranscript|> column — the condition-on-prev prompt
    layout of :mod:`.sequential`; with them (plus the returned
    ``sum_logprobs`` / ``no_speech_prob``) this function is a drop-in for
    ``generate`` at the sequential ladder's greedy rung.

    ``synthetic_acceptance`` (BENCHMARK-ONLY, default off): when set to
    k in (0, 1], both models still execute their full per-step compute but
    their token CHOICES are overridden by a position-keyed oracle — the
    draft proposes the oracle token with probability k (else a wrong one),
    the teacher always chooses the oracle token — so the accept rate per
    drafted token is exactly k.  This turns the projected speedup-vs-
    acceptance curve into an on-chip measurement without trained
    checkpoints (zero-egress sandbox; reference measures ~2x at its real
    acceptance rates, README.md:352-432).  Output tokens are synthetic.
    """
    assert prompt_ids.shape[0] == 1, "speculative decoding is batch-1"
    b, p = prompt_ids.shape
    total = p + opts.max_new_tokens
    assert total <= min(teacher_cfg.max_target_positions,
                        draft_cfg.max_target_positions)
    eos = teacher_cfg.eos_token_id

    def _oracle(pos):
        # position-keyed pseudo-random token, kept far from eos/specials
        # (Knuth multiplicative hash, folded into int32 range)
        return (pos * jnp.int32(60493) % jnp.int32(997)) % 400 + 10

    noise_key = jax.random.PRNGKey(synthetic_seed)

    prompt_ids = prompt_ids.astype(jnp.int32)
    # gamma+1 slack: the verify window may overhang the budget near the end —
    # without it dynamic_update_slice would clamp the start index and corrupt
    # already-accepted tokens.  Overhang slots are junk and sliced off below.
    slack = gamma + 1
    t_cache = init_cache(teacher_cfg, b, dtype=dtype, max_len=total + slack)
    d_cache = init_cache(draft_cfg, b, dtype=dtype, max_len=total + slack)

    # Prefill both models on the prompt.
    t_logits, t_cache = decode(teacher_dec, teacher_cfg, prompt_ids,
                               cross=teacher_cross, cache=t_cache,
                               pos_offset=0, pad_len=pad_len, dtype=dtype)
    _, d_cache = decode(draft_dec, draft_cfg, prompt_ids[:, :-1],
                        cross=draft_cross, cache=d_cache,
                        pos_offset=0, pad_len=pad_len, dtype=dtype)
    # <|nospeech|> probability at the SOT column (same convention as
    # generate(): static sot_slot under the left-padded prompt layout)
    if opts.no_speech_token_id is not None:
        if sot_slot is not None:
            sot_logits = t_logits[:, sot_slot]
        elif pad_len is None:
            sot_logits = t_logits[:, 0]
        else:
            sot_logits = jnp.take_along_axis(
                t_logits, pad_len.astype(jnp.int32)[:, None, None], axis=1
            )[:, 0]
        probs0 = jax.nn.softmax(sot_logits.astype(jnp.float32), -1)
        no_speech_prob = probs0[:, opts.no_speech_token_id]
    else:
        no_speech_prob = jnp.zeros((b,), jnp.float32)

    # First token comes straight from the teacher (position p).
    ts0 = L.TimestampState.init(b)
    first_scores = _process(t_logits[:, -1].astype(jnp.float32), 0,
                            teacher_cfg, opts, p, ts_state=ts0)
    if synthetic_acceptance is not None:
        first_scores = _bias_to(first_scores, _oracle(p))
    first_tok = jnp.argmax(first_scores, axis=-1).astype(jnp.int32)
    first_lp = jax.nn.log_softmax(first_scores, axis=-1)[0, first_tok[0]]

    tokens = jnp.full((b, total + slack), teacher_cfg.pad_token_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids, (0, 0))
    tokens = jax.lax.dynamic_update_slice(tokens, first_tok[:, None], (0, p))

    state = dict(
        tokens=tokens,
        cur=jnp.asarray(p + 1, jnp.int32),   # tokens[0..cur-1] accepted
        t_cache=t_cache, d_cache=d_cache,
        finished=(first_tok[0] == eos),
        rounds=jnp.zeros((), jnp.int32),
        drafted=jnp.zeros((), jnp.int32),
        accepted=jnp.zeros((), jnp.int32),
        sum_logprobs=first_lp.astype(jnp.float32),
        ts=ts0.update(first_tok, teacher_cfg.timestamp_begin),
    )

    def cond(s):
        return jnp.logical_and(s["cur"] < total, ~s["finished"])

    def body(s):
        cur = s["cur"]

        # ---- draft proposes gamma tokens (sequential, tiny model) ----
        # The draft runs the SAME processor stack (incl. the timestamp FSM
        # from the carried accepted-prefix state) so its proposals are
        # FSM-legal — pure acceptance-rate hygiene, never correctness.
        def draft_step(carry, _):
            tok, offset, cache, dts = carry
            lg, cache = decode(draft_dec, draft_cfg, tok[:, None],
                               cross=draft_cross, cache=cache,
                               pos_offset=offset, pad_len=pad_len,
                               dtype=dtype)
            gen_idx = offset + 1 - p
            scores = _process(lg[:, -1].astype(jnp.float32), gen_idx,
                              draft_cfg, opts, p, ts_state=dts)
            if synthetic_acceptance is not None:
                tok_pos = offset + 1
                agree = jax.random.bernoulli(
                    jax.random.fold_in(noise_key, tok_pos),
                    synthetic_acceptance)
                target = jnp.where(agree, _oracle(tok_pos),
                                   _oracle(tok_pos) + 1)
                scores = _bias_to(scores, target)
            nxt = jnp.argmax(scores, axis=-1).astype(jnp.int32)
            return (nxt, offset + 1, cache,
                    dts.update(nxt, draft_cfg.timestamp_begin)), nxt

        last_tok = jax.lax.dynamic_slice(s["tokens"], (0, cur - 1), (b, 1))[:, 0]
        (_, _, d_cache, _), drafts = jax.lax.scan(
            draft_step, (last_tok, cur - 1, s["d_cache"], s["ts"]), None,
            length=gamma)
        drafts = drafts[:, 0]  # [gamma]

        # ---- teacher verifies [last_accepted, d_0..d_{gamma-1}] at once ----
        t_in = jnp.concatenate([last_tok, drafts])[None, :]  # [1, gamma+1]
        t_logits, t_cache = decode(teacher_dec, teacher_cfg, t_in,
                                   cross=teacher_cross, cache=s["t_cache"],
                                   pos_offset=cur - 1, pad_len=pad_len,
                                   dtype=dtype)
        # teacher always "chooses" the oracle token for its position
        bias_fn = (None if synthetic_acceptance is None
                   else lambda sc, pos: _bias_to(sc, _oracle(pos)))
        t_choice, t_logp = _teacher_choices(t_logits, cur, p, gamma,
                                            teacher_cfg, opts, bias_fn,
                                            ts_state=s["ts"], drafts=drafts)
        accepted_vec, n_eff, finished = _verify_accept(
            t_choice, drafts, cur, total, eos, gamma)

        tokens = jax.lax.dynamic_update_slice(
            s["tokens"], accepted_vec[None, :], (0, cur))
        # logprob accounting over the emitted window (and never past the
        # budget — generate() stops at ``total`` exactly)
        idx = jax.lax.broadcasted_iota(jnp.int32, (gamma + 1,), 0)
        emit = jnp.logical_and(idx <= n_eff, cur + idx < total)
        sum_logprobs = s["sum_logprobs"] + jnp.sum(
            jnp.where(emit, t_logp, 0.0))
        return dict(tokens=tokens, cur=cur + n_eff + 1,
                    t_cache=t_cache, d_cache=d_cache, finished=finished,
                    rounds=s["rounds"] + 1,
                    drafted=s["drafted"] + gamma,
                    accepted=s["accepted"] + n_eff,
                    sum_logprobs=sum_logprobs,
                    ts=_ts_advance(s["ts"], accepted_vec, n_eff,
                                   teacher_cfg.timestamp_begin))

    state = jax.lax.while_loop(cond, body, state)
    seq_len = jnp.minimum(state["cur"], total)
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, total), 1)
    tokens = jnp.where(iota < seq_len, state["tokens"][:, :total],
                       teacher_cfg.pad_token_id)
    return SpeculativeOutput(sequences=tokens, seq_len=seq_len[None],
                             rounds=state["rounds"], drafted=state["drafted"],
                             accepted=state["accepted"],
                             sum_logprobs=state["sum_logprobs"][None],
                             no_speech_prob=no_speech_prob)


def speculative_generate_batched(
        teacher_dec: Dict[str, Any], teacher_cfg: WhisperConfig,
        draft_dec: Dict[str, Any], draft_cfg: WhisperConfig,
        teacher_cross: Dict[str, Any], draft_cross: Dict[str, Any],
        prompt_ids: jnp.ndarray, opts: GenerationOptions,
        gamma: int = 5, dtype=jnp.float32,
        synthetic_acceptance: float = None,
        synthetic_seed: int = 0,
        pad_len=None, sot_slot=None) -> SpeculativeOutput:
    """Batched speculative decoding — ``vmap`` of the bs-1 accept/verify
    loop over the batch (BEYOND the reference surface: HF assisted
    generation, and therefore the reference's speculative mode, is
    batch-1-only — /root/reference/training/run_eval.py:578-599).

    Why vmap is the right TPU shape: weights are shared across lanes
    (in_axes=None), so every per-lane decode inside the loop becomes ONE
    batched matmul over the active lanes — the weight-read floor that
    dominates bs-1 decoding amortises across the batch.  Each lane keeps
    its own cursor/caches; XLA lifts the vmapped ``while_loop`` to a
    single loop with ``cond = any(lane active)`` whose body is masked for
    finished lanes, so lanes may accept different numbers of tokens per
    round and finish at different times.  Per-lane outputs are identical
    to the bs-1 path (tests/test_speculative.py).
    """
    n = prompt_ids.shape[0]
    if n == 1:
        out = speculative_generate(
            teacher_dec, teacher_cfg, draft_dec, draft_cfg,
            teacher_cross, draft_cross, prompt_ids, opts, gamma=gamma,
            dtype=dtype, synthetic_acceptance=synthetic_acceptance,
            synthetic_seed=synthetic_seed, pad_len=pad_len,
            sot_slot=sot_slot)
        # normalise to the batched contract: per-lane [N]-shaped counters
        return SpeculativeOutput(
            sequences=out.sequences, seq_len=out.seq_len,
            rounds=out.rounds[None], drafted=out.drafted[None],
            accepted=out.accepted[None], sum_logprobs=out.sum_logprobs,
            no_speech_prob=out.no_speech_prob)

    def one(t_cross, d_cross, prompt, lane_seed, lane_pad):
        # vmap strips the mapped batch axis — restore the singleton the
        # bs-1 loop expects ([L, T, D] -> [L, 1, T, D], scales likewise)
        t_cross = jax.tree.map(lambda x: x[:, None], t_cross)
        d_cross = jax.tree.map(lambda x: x[:, None], d_cross)
        return speculative_generate(
            teacher_dec, teacher_cfg, draft_dec, draft_cfg,
            t_cross, d_cross, prompt[None], opts, gamma=gamma, dtype=dtype,
            synthetic_acceptance=synthetic_acceptance,
            synthetic_seed=lane_seed,
            pad_len=None if lane_pad is None else lane_pad[None],
            sot_slot=sot_slot)

    # cross trees are [L, B, T, D] (scales [L, B, ...]): batch is axis 1.
    # Per-lane synthetic seeds: lanes must accept/reject INDEPENDENTLY or
    # the vmapped while_loop (cond = any(active)) never pays the
    # max-over-lanes round count real workloads pay.
    axes1 = jax.tree.map(lambda _: 1, teacher_cross)
    axes2 = jax.tree.map(lambda _: 1, draft_cross)
    lane_seeds = synthetic_seed + jnp.arange(n, dtype=jnp.int32)
    if pad_len is None:
        fn = lambda tc, dc, pr, sd: one(tc, dc, pr, sd, None)
        out = jax.vmap(fn, in_axes=(axes1, axes2, 0, 0))(
            teacher_cross, draft_cross, prompt_ids, lane_seeds)
    else:
        out = jax.vmap(one, in_axes=(axes1, axes2, 0, 0, 0))(
            teacher_cross, draft_cross, prompt_ids, lane_seeds, pad_len)
    return SpeculativeOutput(
        sequences=out.sequences[:, 0],          # [N, 1, total] -> [N, total]
        seq_len=out.seq_len[:, 0],              # [N, 1] -> [N]
        rounds=out.rounds, drafted=out.drafted, accepted=out.accepted,
        sum_logprobs=out.sum_logprobs[:, 0],
        no_speech_prob=out.no_speech_prob[:, 0])


# --------------------------------------------------------------------------
# Prompt-lookup (n-gram) speculative decoding — DRAFT-FREE speculation.
# --------------------------------------------------------------------------

def _propose_ngram(tokens, cur, gamma: int, max_ngram: int, pad_id: int,
                   min_start=0):
    """Draft ``gamma`` tokens by n-gram lookup over the already-accepted
    sequence: find the most recent earlier occurrence of the last-k-gram
    (k = max_ngram down to 1, longest match wins) and copy the tokens that
    followed it.  Pure JAX, O(T * max_ngram) compares per round (T <= 460
    — negligible next to a decode step).

    Returns ``(drafts [gamma] int32, found bool)``.  When no k-gram
    recurs, drafts are ``pad_id`` — the verify step simply accepts 0 and
    the round degrades to one (gamma+1)-wide teacher decode (~the cost of
    a plain decode step: decode is weight/KV-read bound, docs/PERFORMANCE
    measured a wide verify at ~1.2x a 1-token step per layer).

    Correctness never depends on the proposal: every emitted token is the
    teacher's own argmax (``_verify_accept``), so garbage drafts cost
    speed, never tokens.
    """
    t = tokens[0]                       # [T] — bs-1 layout like the spec loop
    T = t.shape[0]
    found = jnp.asarray(False)
    start = jnp.asarray(0, jnp.int32)   # continuation start index
    for k in range(max_ngram, 0, -1):
        gram = jax.lax.dynamic_slice(t, (jnp.maximum(cur - k, 0),), (k,))
        # windows[j] = t[j : j+k] for every start j (static stack of shifts)
        windows = jnp.stack([t[i:T - k + 1 + i] for i in range(k)], axis=1)
        eq = jnp.all(windows == gram[None, :], axis=1)      # [T-k+1]
        j = jax.lax.broadcasted_iota(jnp.int32, (T - k + 1,), 0)
        # strictly-earlier occurrence with >=1 accepted continuation token;
        # j + k <= cur - 1 also excludes the gram matching itself at
        # j = cur - k.  Positions >= cur hold junk from rejected windows —
        # excluded as match sources by the same bound.
        valid = jnp.logical_and(eq, j + k <= cur - 1)
        valid = jnp.logical_and(valid, cur >= k + 1)
        # exclude left-pad filler as a match source (condition-on-prev
        # prompts are left-padded; a gram of pad ids would "match" there)
        valid = jnp.logical_and(valid, j >= min_start)
        jstar = jnp.max(jnp.where(valid, j, -1))
        ok = jstar >= 0
        start = jnp.where(jnp.logical_and(~found, ok), jstar + k, start)
        found = jnp.logical_or(found, ok)
    drafts = jax.lax.dynamic_slice(t, (start,), (gamma,))
    drafts = jnp.where(found, drafts,
                       jnp.full((gamma,), pad_id, jnp.int32))
    return drafts.astype(jnp.int32), found


def ngram_speculative_generate(
        teacher_dec: Dict[str, Any], teacher_cfg: WhisperConfig,
        teacher_cross: Dict[str, Any],
        prompt_ids: jnp.ndarray, opts: GenerationOptions,
        gamma: int = 5, max_ngram: int = 3, dtype=jnp.float32,
        synthetic_period: int = None, synthetic_repeat_prob: float = None,
        pad_len=None, sot_slot=None) -> SpeculativeOutput:
    """Prompt-lookup decoding: n-gram speculation with NO draft model
    (HF transformers' ``prompt_lookup_num_tokens``; Saxena 2023 "Prompt
    Lookup Decoding").  The teacher verifies exactly as in
    ``speculative_generate`` — output is token-identical to teacher-only
    greedy — but proposals come from copying the continuation of the most
    recent repeated n-gram in the sequence built so far.

    Why this fits ASR serving: condition-on-prev long-form prompts embed
    the previous segment's text, and real speech repeats phrases — every
    repeat is free draft tokens with zero extra model compute and zero
    extra memory (no draft weights, no draft KV cache).  Beyond the
    reference surface (its speculative mode requires a trained assistant
    checkpoint, training/run_eval.py:578-599).

    ``synthetic_period`` (BENCHMARK-ONLY): bias the teacher's token
    choices to a fixed pseudo-random sequence with period R — after the
    first R tokens every lookup succeeds, measuring the technique's
    ceiling speedup on-chip without trained weights (the same
    keep-the-data-dependence trick as ``synthetic_acceptance``).
    ``synthetic_repeat_prob`` q (BENCHMARK-ONLY, requires a period)
    dilutes the oracle: each position emits the periodic token with
    probability q and a position-unique token otherwise — q-repeating
    text, interpolating between the no-repetition floor (q=0) and the
    ceiling (q=1).  Sweeping q publishes speedup-vs-repetition-rate, the
    calibration that bounds what real traffic can expect.

    ``opts.return_timestamps`` composes exactly as in
    :func:`speculative_generate` (per-column FSM in the verify pass);
    ``pad_len``/``sot_slot`` make this a drop-in for ``generate`` at the
    sequential long-form ladder's greedy rung — the highest-value spot for
    prompt lookup, since condition-on-prev prompts embed the previous
    window's text verbatim."""
    assert prompt_ids.shape[0] == 1, "ngram speculation is per-lane/bs-1"
    b, p = prompt_ids.shape
    total = p + opts.max_new_tokens
    assert total <= teacher_cfg.max_target_positions
    eos = teacher_cfg.eos_token_id
    pad = teacher_cfg.pad_token_id

    rep_key = jax.random.PRNGKey(9)

    def _oracle_p(pos):
        # period-R pseudo-random token stream, kept far from eos/specials
        periodic = ((pos % synthetic_period) * jnp.int32(131)
                    % jnp.int32(389)) % 400 + 10
        if synthetic_repeat_prob is None or synthetic_repeat_prob >= 1.0:
            return periodic
        # position-pseudo-unique filler breaks the repetition at this
        # position (deterministic per pos: the lookup and the verify see
        # the same stream); drawn PAST the periodic band (10..409) and
        # inside the vocab — an out-of-vocab target would degrade
        # _bias_to to the model's real (looping) choices
        lo = 410
        span = max(min(teacher_cfg.vocab_size - 1 - lo, 400), 1)
        unique = (pos * jnp.int32(7919)
                  % jnp.int32(25013)) % jnp.int32(span) + lo
        rep = jax.random.bernoulli(jax.random.fold_in(rep_key, pos),
                                   synthetic_repeat_prob)
        return jnp.where(rep, periodic, unique)

    bias_fn = (None if synthetic_period is None
               else lambda sc, pos: _bias_to(sc, _oracle_p(pos)))

    prompt_ids = prompt_ids.astype(jnp.int32)
    slack = gamma + 1
    t_cache = init_cache(teacher_cfg, b, dtype=dtype, max_len=total + slack)

    t_logits, t_cache = decode(teacher_dec, teacher_cfg, prompt_ids,
                               cross=teacher_cross, cache=t_cache,
                               pos_offset=0, pad_len=pad_len, dtype=dtype)
    if opts.no_speech_token_id is not None:
        if sot_slot is not None:
            sot_logits = t_logits[:, sot_slot]
        elif pad_len is None:
            sot_logits = t_logits[:, 0]
        else:
            sot_logits = jnp.take_along_axis(
                t_logits, pad_len.astype(jnp.int32)[:, None, None], axis=1
            )[:, 0]
        probs0 = jax.nn.softmax(sot_logits.astype(jnp.float32), -1)
        no_speech_prob = probs0[:, opts.no_speech_token_id]
    else:
        no_speech_prob = jnp.zeros((b,), jnp.float32)

    ts0 = L.TimestampState.init(b)
    first_scores = _process(t_logits[:, -1].astype(jnp.float32), 0,
                            teacher_cfg, opts, p, ts_state=ts0)
    if bias_fn is not None:
        first_scores = bias_fn(first_scores, p)
    first_tok = jnp.argmax(first_scores, axis=-1).astype(jnp.int32)
    first_lp = jax.nn.log_softmax(first_scores, axis=-1)[0, first_tok[0]]

    tokens = jnp.full((b, total + slack), pad, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids, (0, 0))
    tokens = jax.lax.dynamic_update_slice(tokens, first_tok[:, None], (0, p))

    state = dict(
        tokens=tokens,
        cur=jnp.asarray(p + 1, jnp.int32),
        t_cache=t_cache,
        finished=(first_tok[0] == eos),
        rounds=jnp.zeros((), jnp.int32),
        drafted=jnp.zeros((), jnp.int32),
        accepted=jnp.zeros((), jnp.int32),
        sum_logprobs=first_lp.astype(jnp.float32),
        ts=ts0.update(first_tok, teacher_cfg.timestamp_begin),
    )

    def cond(s):
        return jnp.logical_and(s["cur"] < total, ~s["finished"])

    min_start = 0 if pad_len is None else pad_len[0]

    def body(s):
        cur = s["cur"]
        drafts, found = _propose_ngram(s["tokens"], cur, gamma,
                                       max_ngram, pad, min_start=min_start)
        last_tok = jax.lax.dynamic_slice(
            s["tokens"], (0, cur - 1), (b, 1))[:, 0]
        t_in = jnp.concatenate([last_tok, drafts])[None, :]  # [1, gamma+1]
        t_logits, t_cache = decode(teacher_dec, teacher_cfg, t_in,
                                   cross=teacher_cross, cache=s["t_cache"],
                                   pos_offset=cur - 1, pad_len=pad_len,
                                   dtype=dtype)
        t_choice, t_logp = _teacher_choices(t_logits, cur, p, gamma,
                                            teacher_cfg, opts, bias_fn,
                                            ts_state=s["ts"], drafts=drafts)
        accepted_vec, n_eff, finished = _verify_accept(
            t_choice, drafts, cur, total, eos, gamma)
        tokens = jax.lax.dynamic_update_slice(
            s["tokens"], accepted_vec[None, :], (0, cur))
        idx = jax.lax.broadcasted_iota(jnp.int32, (gamma + 1,), 0)
        emit = jnp.logical_and(idx <= n_eff, cur + idx < total)
        sum_logprobs = s["sum_logprobs"] + jnp.sum(
            jnp.where(emit, t_logp, 0.0))
        # acceptance-rate stats count only real lookups (pad fillers would
        # deflate the rate without carrying information)
        g = jnp.where(found, gamma, 0)
        return dict(tokens=tokens, cur=cur + n_eff + 1,
                    t_cache=t_cache, finished=finished,
                    rounds=s["rounds"] + 1,
                    drafted=s["drafted"] + g,
                    accepted=s["accepted"] + jnp.minimum(n_eff, g),
                    sum_logprobs=sum_logprobs,
                    ts=_ts_advance(s["ts"], accepted_vec, n_eff,
                                   teacher_cfg.timestamp_begin))

    state = jax.lax.while_loop(cond, body, state)
    seq_len = jnp.minimum(state["cur"], total)
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, total), 1)
    tokens = jnp.where(iota < seq_len, state["tokens"][:, :total], pad)
    return SpeculativeOutput(sequences=tokens, seq_len=seq_len[None],
                             rounds=state["rounds"], drafted=state["drafted"],
                             accepted=state["accepted"],
                             sum_logprobs=state["sum_logprobs"][None],
                             no_speech_prob=no_speech_prob)


def ngram_speculative_generate_batched(
        teacher_dec: Dict[str, Any], teacher_cfg: WhisperConfig,
        teacher_cross: Dict[str, Any],
        prompt_ids: jnp.ndarray, opts: GenerationOptions,
        gamma: int = 5, max_ngram: int = 3, dtype=jnp.float32,
        synthetic_period: int = None, synthetic_repeat_prob: float = None,
        pad_len=None, sot_slot=None) -> SpeculativeOutput:
    """Batched prompt-lookup decoding — ``vmap`` of the bs-1 loop over
    the batch, same lane-parallel shape as
    ``speculative_generate_batched`` (weights shared via in_axes=None;
    per-lane cursors; lanes accept different counts per round)."""
    n = prompt_ids.shape[0]
    if n == 1:
        out = ngram_speculative_generate(
            teacher_dec, teacher_cfg, teacher_cross, prompt_ids, opts,
            gamma=gamma, max_ngram=max_ngram, dtype=dtype,
            synthetic_period=synthetic_period,
            synthetic_repeat_prob=synthetic_repeat_prob, pad_len=pad_len,
            sot_slot=sot_slot)
        return SpeculativeOutput(
            sequences=out.sequences, seq_len=out.seq_len,
            rounds=out.rounds[None], drafted=out.drafted[None],
            accepted=out.accepted[None], sum_logprobs=out.sum_logprobs,
            no_speech_prob=out.no_speech_prob)

    def one(t_cross, prompt, lane_pad):
        t_cross = jax.tree.map(lambda x: x[:, None], t_cross)
        return ngram_speculative_generate(
            teacher_dec, teacher_cfg, t_cross, prompt[None], opts,
            gamma=gamma, max_ngram=max_ngram, dtype=dtype,
            synthetic_period=synthetic_period,
            synthetic_repeat_prob=synthetic_repeat_prob,
            pad_len=None if lane_pad is None else lane_pad[None],
            sot_slot=sot_slot)

    axes = jax.tree.map(lambda _: 1, teacher_cross)
    if pad_len is None:
        fn = lambda tc, pr: one(tc, pr, None)
        out = jax.vmap(fn, in_axes=(axes, 0))(teacher_cross, prompt_ids)
    else:
        out = jax.vmap(one, in_axes=(axes, 0, 0))(
            teacher_cross, prompt_ids, pad_len)
    return SpeculativeOutput(
        sequences=out.sequences[:, 0], seq_len=out.seq_len[:, 0],
        rounds=out.rounds, drafted=out.drafted, accepted=out.accepted,
        sum_logprobs=out.sum_logprobs[:, 0],
        no_speech_prob=out.no_speech_prob[:, 0])
