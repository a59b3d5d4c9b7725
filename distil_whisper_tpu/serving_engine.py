"""Continuous-batching decode engine (in-flight batching for serving).

:class:`~distil_whisper_tpu.serving.BatchingTranscriber` batches concurrent
requests into whole-batch ``generate`` calls: every lane in a batch runs
until the LAST lane finishes, and requests that arrive mid-batch wait for
the full decode (up to ``max_new_tokens`` steps).  On a weight/KV-read-bound
decode that is pure waste — a finished lane's slot costs the same HBM
traffic as an active one.  This module keeps a fixed set of ``lanes``
decoding continuously and swaps completed requests out / queued requests in
*between jitted step-blocks*, so the device never waits for stragglers:

* every lane carries its OWN cursor — the decoder stack supports per-lane
  positions end-to-end (``models.whisper.decode(pos_offset=[B])`` writes
  K/V, reads position embeddings and masks attention per lane; the logits
  rules take per-lane ``gen_idx``) — so lanes at different depths share one
  compiled single-token step;
* admission runs encoder + prompt prefill for JUST the new requests (an
  ``A``-sized compiled bucket) and row-scatters their cross-KV / cache /
  FSM state into the engine lanes;
* the host pipelines two step-blocks deep: block ``k+1`` is dispatched
  before block ``k``'s (small) outputs are fetched, so the ~30-50 ms fetch
  round-trip of the remote-TPU tunnel hides behind device compute.

Per-lane options: language / task (prompt content), ``return_timestamps``
(per-lane FSM gate), ``max_new_tokens`` (per-lane budget), and sampling —
per-lane ``temperature`` / ``top_k`` / PRNG key (temperature 0 = greedy,
the default; the host dispatches a separate compiled sampling step-block
only while a sampled lane is resident, so greedy-only traffic runs the
unchanged greedy program) — one engine serves mixed traffic.  Long files (>30 s) are
split into the pipeline's strided windows and the windows ride lanes like
any short request (chunked long-form is independent across windows) — a
long file transcribes in parallel and never stalls concurrent short
requests.  Word-level timestamps (``return_timestamps="word"``) need the
pipeline's cross-attention alignment pass, which is not expressible as a
lane — those requests are served by a dedicated fallback thread (device
calls interleave with the engine's; lanes never wait host-side).

With an ``assistant`` draft model the lanes run SPECULATIVE decoding
(reference README.md:352-432): each block round drafts ``gamma`` tokens
per lane and verifies all of them with one (gamma+1)-wide teacher decode
at the per-lane cursors — in-flight batching and draft-assisted decoding
compose, which neither the reference (batch-1 offline speculative) nor the
whole-batch scheduler (batch-synchronous speculative) offers.  Output
stays token-identical to the greedy engine.

The reference has no serving layer at all (its user surface stops at
``FlaxWhisperPipeline``, /root/reference/training/flax/distil_whisper/
pipeline.py); in-flight batching is the TPU-native design a serving
deployment actually needs.  Outputs are token-identical to the whole-batch
``generate`` path (tests/test_serving_engine.py).
"""

from __future__ import annotations

import logging
import os
import queue
import threading
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger("distil_whisper_tpu")


def _zero_cross(cfg, batch: int, dtype):
    """Zero-filled cross-KV buffer matching :func:`models.whisper.cross_kv`'s
    output structure for ``batch`` lanes."""
    import jax.numpy as jnp
    L = cfg.decoder_layers
    t = cfg.max_source_positions
    d = cfg.decoder_attention_heads * cfg.decoder_head_dim
    if cfg.quantize_cross_kv:
        return {"k_q": jnp.zeros((L, batch, t, d), jnp.int8),
                "k_scale": jnp.zeros((L, batch, 1, d), jnp.float32),
                "v_q": jnp.zeros((L, batch, t, d), jnp.int8),
                "v_scale": jnp.zeros((L, batch, 1, d), jnp.float32)}
    return {"k": jnp.zeros((L, batch, t, d), dtype),
            "v": jnp.zeros((L, batch, t, d), dtype)}


class ContinuousBatchingEngine:
    """Device-side state + compiled step/admit programs.

    One instance owns ``lanes`` decode slots over a single
    :class:`...pipeline.WhisperPipeline`'s params/config.  Thread-safety is
    the caller's job (the :class:`ContinuousTranscriber` worker is the only
    thread that touches the device).
    """

    def __init__(self, pipe, lanes: int = 8, block_steps: int = 16,
                 max_new_tokens: Optional[int] = None,
                 assistant=None, gamma: int = 5,
                 synthetic_acceptance: Optional[float] = None,
                 top_k_max: int = 64,
                 ngram_speculative: bool = False, max_ngram: int = 3,
                 synthetic_period: Optional[int] = None):
        import jax.numpy as jnp
        from .generation import GenerationOptions

        self.pipe = pipe
        self.cfg = pipe.cfg
        self.tok = pipe.tokenizer
        self.dtype = pipe.dtype
        self.lanes = lanes
        self.block_steps = block_steps
        self.max_new = int(max_new_tokens or pipe.max_new_tokens)
        # speculative decoding on the lanes (reference README.md:352-432):
        # ``assistant`` = (draft_params, draft_cfg).  Each block iteration
        # becomes a draft-gamma + verify round advancing 1..gamma+1 tokens
        # per lane; output stays token-identical to the greedy engine.
        # ``synthetic_acceptance`` (BENCHMARK-ONLY, same contract as
        # generation.speculative): both models run their full compute but
        # token CHOICES follow a position-keyed oracle so the per-draft
        # accept rate is pinned — measures the engine's speculative cost
        # structure with random weights (zero-egress sandbox).
        self.assistant = assistant
        self.gamma = int(gamma)
        # prompt-lookup (n-gram) speculation on the lanes: DRAFT-FREE —
        # proposals are copied from the most recent repeated n-gram in each
        # lane's own decoded sequence; the verify contract (and therefore
        # token identity, fallback routing, adaptive gamma) is unchanged.
        # ``synthetic_period`` (BENCHMARK-ONLY) biases the teacher to a
        # period-R per-lane oracle so the text repeats — the lookup
        # ceiling, measurable with random weights.
        self.ngram = bool(ngram_speculative)
        if self.ngram and assistant is not None:
            raise ValueError(
                "pick ONE speculation method: assistant draft or ngram lookup")
        self.max_ngram = int(max_ngram)
        self.synthetic_period = synthetic_period
        self.spec = assistant is not None or self.ngram
        if synthetic_acceptance is not None and self.ngram:
            # scoped to speculative engines: on a plain greedy engine the
            # knob is a harmless no-op (kept for callers that pass it
            # unconditionally)
            raise ValueError(
                "synthetic_acceptance pins a DRAFT's agreement; for ngram "
                "use synthetic_period (repeating-text oracle)")
        self.synthetic_acceptance = synthetic_acceptance
        # longest possible prompt: [sot, lang?, task?, notimestamps]
        langs = sorted(self.tok.lang_to_id) or [None]
        self.p_max = len(self.tok.prompt_ids(
            language=langs[0], task="transcribe", no_timestamps=True))
        self.t_store = self.p_max + self.max_new
        assert self.t_store <= self.cfg.max_target_positions, (
            f"p_max({self.p_max}) + max_new({self.max_new}) exceeds "
            f"{self.cfg.max_target_positions}")
        if assistant is not None:
            assert self.t_store <= assistant[1].max_target_positions, (
                "draft max_target_positions too small for the serve budget")
        # adaptive-gamma headroom: the step program is compiled per gamma
        # (the transcriber's controller may dispatch a longer/shorter draft
        # length as the measured acceptance moves); buffers are sized once
        # for the largest
        self.gamma_max = 2 * self.gamma if self.spec else 0
        # scratch slack: frozen lanes keep writing (token, K/V) at their
        # frozen cursor == their final length, which may equal t_store; a
        # speculative round additionally writes a gamma+1-wide candidate
        # window at the cursor, so the slack widens to gamma_max+1
        self.t_buf = self.t_store + (self.gamma_max + 1 if self.spec else 1)
        self.opts = GenerationOptions.from_config(
            self.cfg, max_new_tokens=self.max_new, return_timestamps=True,
            no_speech_token_id=self.tok.no_speech)
        # per-lane sampling (greedy engine only — the speculative verify
        # contract is argmax agreement): lanes carry their own temperature /
        # top-k / PRNG key.  ``top_k_max`` is the compiled-in top-k width
        # (one static lax.top_k; each lane masks below ITS OWN kth value) —
        # requests asking for a larger k are rejected at submission.
        self.k_max = int(top_k_max)
        self._jit_cache: Dict[Any, Any] = {}
        self._state = None
        self._jnp = jnp

    # ------------------------------------------------------------- state
    def init_state(self):
        import jax.numpy as jnp
        from .generation.logits import TimestampState
        from .models.whisper import init_cache
        b = self.lanes
        cfg = self.cfg
        self._state = dict(
            cache=init_cache(cfg, b, dtype=self.dtype, max_len=self.t_buf),
            cross=_zero_cross(cfg, b, self.dtype),
            tokens=jnp.full((b, self.t_buf), cfg.pad_token_id, jnp.int32),
            last_logits=jnp.zeros((b, cfg.vocab_size), jnp.float32),
            ts=TimestampState.init(b),
            use_ts=jnp.zeros((b,), bool),
            prompt_len=jnp.ones((b,), jnp.int32),
            budget=jnp.zeros((b,), jnp.int32),
            pos=jnp.ones((b,), jnp.int32),
            finished=jnp.ones((b,), bool),
            sum_logprobs=jnp.zeros((b,), jnp.float32),
            no_speech_prob=jnp.zeros((b,), jnp.float32),
        )
        if self.spec:
            self._state.update(
                drafted=jnp.zeros((b,), jnp.int32),
                accepted=jnp.zeros((b,), jnp.int32),
            )
            if self.assistant is not None:
                d_cfg = self.assistant[1]
                self._state.update(
                    d_cache=init_cache(d_cfg, b, dtype=self.dtype,
                                       max_len=self.t_buf),
                    d_cross=_zero_cross(d_cfg, b, self.dtype),
                )
        else:
            # per-lane sampling state (greedy engine only; sampled requests
            # under a speculative engine ride the fallback thread)
            self._state.update(
                temp=jnp.zeros((b,), jnp.float32),
                topk=jnp.zeros((b,), jnp.int32),
                rng=jnp.zeros((b, 2), jnp.uint32),
            )
        return self._state

    # ------------------------------------------------------------- step
    def _step_block(self, sampling: bool = False):
        """jit (params, state) -> (state', packed) where ``packed`` is ONE
        fresh int32 vector ``[finished | pos | tokens.ravel()]`` — a
        concatenate output can never alias the state buffers, so the host
        may dispatch the NEXT (state-donating) block before fetching it
        (the depth-2 pipelining in :class:`ContinuousTranscriber`).

        Two compiled variants: the default greedy block (argmax select —
        byte-identical to the engine before sampling existed), and a
        ``sampling`` block whose select is per-lane temperature/top-k
        categorical where ``temp > 0`` and argmax elsewhere.  The host
        dispatches the sampling variant only while a sampled lane is
        resident — greedy traffic never pays for the sampling machinery
        (a lax.cond inside the token loop measured ~7% once before; a
        host-side program switch costs nothing)."""
        key = ("step", sampling)
        if key in self._jit_cache:
            return self._jit_cache[key]
        if self.spec:
            return self._spec_block(self.gamma)
        import jax
        import jax.numpy as jnp
        from .generation import logits as L
        from .models.whisper import decode

        cfg, opts = self.cfg, self.opts
        n_steps = self.block_steps
        dtype = self.dtype
        k_max = self.k_max

        def block(params, state):
            dec_params = params["decoder"]

            def one_step(_, s):
                gen_idx = s["pos"] - s["prompt_len"]                  # [B]
                scores = s["last_logits"]
                scores = L.force_tokens(scores, gen_idx,
                                        opts.forced_decoder_ids,
                                        s["prompt_len"])
                scores = L.suppress_tokens_at_begin(
                    scores, gen_idx, opts.begin_suppress_tokens)
                scores = L.suppress_tokens(scores, opts.suppress_tokens)
                scores = L.min_new_tokens(scores, gen_idx,
                                          opts.min_new_tokens,
                                          cfg.eos_token_id)
                ts_scores = L.timestamp_rules(
                    scores, gen_idx, s["ts"], cfg,
                    opts.max_initial_timestamp_index)
                scores = jnp.where(s["use_ts"][:, None], ts_scores, scores)

                nxt = jnp.argmax(scores, axis=-1).astype(jnp.int32)
                if sampling:
                    # per-lane temperature sampling with per-lane top-k:
                    # ONE static lax.top_k(k_max); each lane masks below its
                    # own kth value (topk == 0 -> full vocab).  Per-lane
                    # PRNG: the lane's admission key folded with its decode
                    # position — deterministic per (key, position), never
                    # reused (pos strictly advances per lane).
                    t = jnp.maximum(s["temp"], 1e-6)[:, None]
                    sc = scores / t
                    vals = jax.lax.top_k(sc, k_max)[0]
                    idx = jnp.clip(s["topk"] - 1, 0, k_max - 1)
                    kth = jnp.take_along_axis(vals, idx[:, None], axis=1)
                    sc = jnp.where((s["topk"] > 0)[:, None] & (sc < kth),
                                   L.NEG_INF, sc)
                    keys = jax.vmap(jax.random.fold_in)(s["rng"], gen_idx)
                    drawn = jax.vmap(jax.random.categorical)(keys, sc)
                    nxt = jnp.where(s["temp"] > 0,
                                    drawn.astype(jnp.int32), nxt)
                logp = jax.nn.log_softmax(scores, axis=-1)
                tok_logp = jnp.take_along_axis(logp, nxt[:, None],
                                               axis=-1)[:, 0]

                frozen = s["finished"]
                nxt = jnp.where(frozen, cfg.pad_token_id, nxt)
                sum_logprobs = s["sum_logprobs"] + jnp.where(frozen, 0.0,
                                                             tok_logp)
                budget_hit = gen_idx + 1 >= s["budget"]
                finished = jnp.logical_or(
                    frozen,
                    jnp.logical_or(nxt == cfg.eos_token_id, budget_hit))

                # frozen lanes write at their frozen cursor (== their final
                # length — a slot holding no real content; t_buf carries a
                # scratch column for lanes that ended exactly at t_store)
                tokens = jax.vmap(
                    lambda row, t, p: jax.lax.dynamic_update_slice(
                        row, t[None], (p,)))(s["tokens"], nxt, s["pos"])
                ts2 = s["ts"].update(nxt, cfg.timestamp_begin)
                ts = L.TimestampState(
                    prev=jnp.where(frozen, s["ts"].prev, ts2.prev),
                    prevprev=jnp.where(frozen, s["ts"].prevprev,
                                       ts2.prevprev),
                    last_ts=jnp.where(frozen, s["ts"].last_ts, ts2.last_ts))
                pos = jnp.where(frozen, s["pos"], s["pos"] + 1)

                # decode the token just written, at its own lane cursor
                # (frozen lanes decode garbage at their scratch slot —
                # masked by the per-lane causal mask, never read)
                lg, cache = decode(dec_params, cfg, nxt[:, None],
                                   cross=s["cross"], cache=s["cache"],
                                   pos_offset=s["pos"], dtype=dtype)
                last_logits = jnp.where(frozen[:, None], s["last_logits"],
                                        lg[:, -1].astype(jnp.float32))
                return dict(s, tokens=tokens, cache=cache,
                            last_logits=last_logits, ts=ts,
                            finished=finished, sum_logprobs=sum_logprobs,
                            pos=pos)

            out = jax.lax.fori_loop(0, n_steps, one_step, state)
            packed = jnp.concatenate([out["finished"].astype(jnp.int32),
                                      out["pos"].astype(jnp.int32),
                                      out["tokens"].reshape(-1)])
            return out, packed

        self._jit_cache[key] = jax.jit(block, donate_argnums=(1,))
        return self._jit_cache[key]

    def _spec_block(self, gamma: int):
        """Compiled speculative block for one draft length (cached per
        gamma; the adaptive controller dispatches different lengths as the
        measured acceptance moves — buffers are sized for gamma_max)."""
        g = int(gamma)
        assert 1 <= g <= self.gamma_max, (g, self.gamma_max)
        key = ("step_spec", g)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build_spec_block(g)
        return self._jit_cache[key]

    def _build_spec_block(self, gamma: int):
        """Speculative step-block: jit (params, d_params, state) ->
        (state', packed).  Each of the block's rounds runs the draft for
        ``gamma`` single-token steps, verifies all proposals with ONE
        (gamma+1)-wide teacher decode at the per-lane cursors, and emits the
        longest matching prefix plus the teacher's own next token — the
        standard accept/verify loop of :mod:`...generation.speculative`,
        lifted to per-lane cursors so lanes accept different counts per
        round and admission/retirement stay block-granular.  Output tokens
        are identical to the greedy engine (the teacher's choice at the
        first mismatch column depends only on accepted-prefix state) — for
        EVERY gamma, which is what makes runtime gamma switching free of
        correctness risk.

        Timestamp lanes ride the same rounds: the Whisper FSM runs per
        verify COLUMN, each column's per-lane state advanced through the
        draft tokens it is conditioned on, gated by ``use_ts`` exactly as
        in the greedy block (same construction as
        generation.speculative._teacher_choices — columns past the first
        mismatch use a counterfactual state but are discarded by the
        accept rule, so every EMITTED token saw the greedy block's FSM
        state).  ``packed`` gains per-lane cumulative drafted/accepted
        counters: ``[finished | pos | drafted | accepted | tokens.ravel()]``.
        """
        import jax
        import jax.numpy as jnp
        from .generation import logits as L
        from .models.whisper import decode

        cfg, opts = self.cfg, self.opts
        ngram, max_ngram = self.ngram, self.max_ngram
        period = self.synthetic_period
        d_params_cfg = self.assistant[1] if self.assistant else None
        gamma = int(gamma)
        # keep tokens-per-block roughly at the greedy block's granularity
        # (streaming partials and admission latency are per-block)
        n_rounds = max(1, self.block_steps // (gamma + 1))
        dtype = self.dtype
        eos = cfg.eos_token_id

        def _proc(scores, gen_idx, prompt_len):
            scores = L.force_tokens(scores, gen_idx,
                                    opts.forced_decoder_ids, prompt_len)
            scores = L.suppress_tokens_at_begin(
                scores, gen_idx, opts.begin_suppress_tokens)
            scores = L.suppress_tokens(scores, opts.suppress_tokens)
            return L.min_new_tokens(scores, gen_idx, opts.min_new_tokens,
                                    eos)

        synth = self.synthetic_acceptance

        def _oracle(p):
            # position-keyed pseudo-random token far from eos/specials
            return (p * jnp.int32(60493) % jnp.int32(997)) % 400 + 10

        def _bias_to(scores, target):
            # clamp+scale keeps the data dependence on the computed logits
            # (overriding the choice directly would make both model
            # forwards dead code and XLA would delete them — the DCE trap
            # documented in docs/PERFORMANCE.md / generation.speculative)
            v = scores.shape[-1]
            iota = jax.lax.broadcasted_iota(jnp.int32, (v,), 0)
            bias = jnp.where(iota[None, :] == target[:, None], 1e6, 0.0)
            return jnp.maximum(scores, -1e5) * 1e-9 + bias

        def _agree(tok_pos):
            # (lane, position)-keyed uniform: lanes must accept/reject
            # INDEPENDENTLY or the engine never pays realistic per-lane
            # round counts
            lane = jax.lax.broadcasted_iota(jnp.uint32, tok_pos.shape, 0)
            h = (tok_pos.astype(jnp.uint32) * jnp.uint32(2654435761)
                 + lane * jnp.uint32(97423))
            u = (h >> jnp.uint32(8)).astype(jnp.float32) / jnp.float32(2**24)
            return u < synth

        def _oracle_p(tok_pos):
            # period-R per-lane pseudo-random stream (lanes phase-shifted
            # so they do not finish in lockstep)
            lane = jax.lax.broadcasted_iota(jnp.int32, tok_pos.shape, 0)
            return (((tok_pos + 31 * lane) % period)
                    * jnp.int32(131) % jnp.int32(389)) % 400 + 10

        def block(params, d_params, state):
            dec = params["decoder"]
            d_dec = d_params["decoder"] if d_params is not None else None

            def one_round(_, s):
                b = s["pos"].shape[0]
                frozen = s["finished"]
                pos, plen = s["pos"], s["prompt_len"]
                last_tok = jnp.take_along_axis(
                    s["tokens"], (pos - 1)[:, None], axis=1)[:, 0]

                use_ts = s["use_ts"]

                def _apply_ts(scores, gidx, ts_state):
                    # per-lane FSM rules, gated exactly like the greedy
                    # block (non-ts lanes see the plain stack)
                    ts_sc = L.timestamp_rules(
                        scores, gidx, ts_state, cfg,
                        opts.max_initial_timestamp_index)
                    return jnp.where(use_ts[:, None], ts_sc, scores)

                if ngram:
                    # ---- drafts from per-lane n-gram lookup (no model)
                    from .generation.speculative import _propose_ngram

                    def lookup(row, cur):
                        return _propose_ngram(row[None], cur, gamma,
                                              max_ngram, cfg.pad_token_id)

                    drafts, found = jax.vmap(lookup)(s["tokens"], pos)
                    d_cache = None
                else:
                    # ---- draft proposes gamma tokens at its lane cursors
                    # (FSM-legal proposals via the carried per-lane state —
                    # acceptance hygiene only, the verify pass decides)
                    def draft_step(carry, _):
                        tok, off, dc, dts = carry
                        lg, dc = decode(d_dec, d_params_cfg, tok[:, None],
                                        cross=s["d_cross"], cache=dc,
                                        pos_offset=off, dtype=dtype)
                        scores = _proc(lg[:, -1].astype(jnp.float32),
                                       off + 1 - plen, plen)
                        scores = _apply_ts(scores, off + 1 - plen, dts)
                        if synth is not None:
                            tok_pos = off + 1
                            target = jnp.where(_agree(tok_pos),
                                               _oracle(tok_pos),
                                               _oracle(tok_pos) + 1)
                            scores = _bias_to(scores, target)
                        nxt = jnp.argmax(scores, -1).astype(jnp.int32)
                        return (nxt, off + 1, dc,
                                dts.update(nxt, cfg.timestamp_begin)), nxt

                    (_, _, d_cache, _), drafts = jax.lax.scan(
                        draft_step,
                        (last_tok, pos - 1, s["d_cache"], s["ts"]), None,
                        length=gamma)
                    drafts = drafts.T                      # [B, gamma]
                    found = jnp.ones((b,), bool)

                # ---- teacher verifies [last_accepted, d_0..d_{g-1}] at once
                t_in = jnp.concatenate([last_tok[:, None], drafts], axis=1)
                t_logits, cache = decode(dec, cfg, t_in, cross=s["cross"],
                                         cache=s["cache"],
                                         pos_offset=pos - 1, dtype=dtype)
                cols, lps = [], []
                col_ts = s["ts"]
                for i in range(gamma + 1):
                    # column i predicts absolute position pos + i
                    sc = _proc(t_logits[:, i].astype(jnp.float32),
                               pos + i - plen, plen)
                    sc = _apply_ts(sc, pos + i - plen, col_ts)
                    if synth is not None:
                        # the teacher always "chooses" its position's oracle
                        sc = _bias_to(sc, _oracle(pos + i))
                    elif period is not None:
                        # periodic oracle: the decoded text repeats with
                        # period R, so lookups succeed — the ngram ceiling
                        sc = _bias_to(sc, _oracle_p(pos + i))
                    ch = jnp.argmax(sc, -1).astype(jnp.int32)
                    lp = jnp.take_along_axis(jax.nn.log_softmax(sc, -1),
                                             ch[:, None], axis=-1)[:, 0]
                    cols.append(ch)
                    lps.append(lp)
                    if i < gamma:
                        col_ts = col_ts.update(drafts[:, i],
                                               cfg.timestamp_begin)
                t_choice = jnp.stack(cols, axis=1)         # [B, gamma+1]
                t_logp = jnp.stack(lps, axis=1)            # [B, gamma+1]

                matches = (drafts == t_choice[:, :gamma]).astype(jnp.int32)
                n = jnp.sum(jnp.cumprod(matches, axis=1), axis=1)   # [B]
                candidate = jnp.concatenate(
                    [drafts, t_choice[:, gamma:]], axis=1)
                idx = jax.lax.broadcasted_iota(
                    jnp.int32, (b, gamma + 1), 1)
                accepted_vec = jnp.where(idx == n[:, None], t_choice,
                                         candidate)

                # eos inside the accepted window ends the lane; budget caps
                # the emit count (greedy semantics: a lane finishes once it
                # has emitted ``budget`` tokens)
                in_window = idx <= n[:, None]
                is_eos = jnp.logical_and(accepted_vec == eos, in_window)
                eos_idx = jnp.min(jnp.where(is_eos, idx, gamma + 1), axis=1)
                n_eff = jnp.minimum(n, eos_idx)
                gen_idx = pos - plen
                allowed = jnp.maximum(s["budget"] - gen_idx, 1)
                emit = jnp.minimum(n_eff + 1, allowed)
                emit = jnp.where(frozen, 0, emit)

                finished = jnp.logical_or(
                    frozen,
                    jnp.logical_or(eos_idx < emit,
                                   gen_idx + emit >= s["budget"]))

                # frozen lanes write their candidate window at the frozen
                # cursor (== final length): pure scratch, t_buf slack covers
                # the full gamma+1 width
                pad_vec = jnp.where(idx < emit[:, None], accepted_vec,
                                    cfg.pad_token_id)
                tokens = jax.vmap(
                    lambda row, v, p: jax.lax.dynamic_update_slice(
                        row, v, (p,)))(s["tokens"], pad_vec, pos)
                sum_logprobs = s["sum_logprobs"] + jnp.sum(
                    jnp.where(idx < emit[:, None], t_logp, 0.0), axis=1)

                # advance the per-lane FSM past the emitted window in one
                # shot (== emit sequential TimestampState.update calls;
                # emit == 0 leaves a lane's state untouched)
                emitted = idx < emit[:, None]
                w_last = jnp.take_along_axis(
                    accepted_vec, jnp.maximum(emit - 1, 0)[:, None],
                    axis=1)[:, 0]
                w_pen = jnp.take_along_axis(
                    accepted_vec, jnp.maximum(emit - 2, 0)[:, None],
                    axis=1)[:, 0]
                old = s["ts"]
                is_ts_w = jnp.logical_and(emitted,
                                          accepted_vec >= cfg.timestamp_begin)
                ts_pos = jnp.max(jnp.where(is_ts_w, idx, -1), axis=1)
                w_ts = jnp.take_along_axis(
                    accepted_vec, jnp.maximum(ts_pos, 0)[:, None],
                    axis=1)[:, 0]
                new_ts = L.TimestampState(
                    prev=jnp.where(emit >= 1, w_last,
                                   old.prev).astype(jnp.int32),
                    prevprev=jnp.where(
                        emit >= 2, w_pen,
                        jnp.where(emit == 1, old.prev,
                                  old.prevprev)).astype(jnp.int32),
                    last_ts=jnp.where(ts_pos >= 0, w_ts,
                                      old.last_ts).astype(jnp.int32))
                # drafted/accepted move together: rounds with no real lookup
                # (found=False — pad fillers) credit neither, or the
                # acceptance-rate estimate could exceed 1 when a pad draft
                # coincidentally matches the teacher's choice
                dead = jnp.logical_or(frozen, ~found)
                live_draft = jnp.where(dead, 0, gamma)
                live_accept = jnp.where(dead, 0, jnp.maximum(emit - 1, 0))
                nxt = dict(
                    s, tokens=tokens, cache=cache, ts=new_ts,
                    finished=finished, sum_logprobs=sum_logprobs,
                    pos=pos + emit,
                    drafted=s["drafted"] + live_draft,
                    accepted=s["accepted"] + live_accept)
                if d_cache is not None:
                    nxt["d_cache"] = d_cache
                return nxt

            out = jax.lax.fori_loop(0, n_rounds, one_round, state)
            packed = jnp.concatenate([out["finished"].astype(jnp.int32),
                                      out["pos"].astype(jnp.int32),
                                      out["drafted"], out["accepted"],
                                      out["tokens"].reshape(-1)])
            return out, packed

        if ngram:
            return jax.jit(lambda params, state: block(params, None, state),
                           donate_argnums=(1,))
        return jax.jit(block, donate_argnums=(2,))

    # ------------------------------------------------------------- admit
    def _admit_fn(self, a: int):
        """jit (params, [d_params,] state, mels[A], prompts[A,Pmax],
        plens[A], budgets[A], use_ts[A], lanes[A]) -> state'.  In
        speculative mode the draft is admitted alongside the teacher: its
        cross-KV comes from the SHARED encoder states when widths match
        (the reference's distil-draft setup) and its cache is prefilled on
        the same padded prompts — pad-slot K/V beyond each prompt is stale
        but provably overwritten before the cursor can attend it."""
        key = ("admit", a)
        if key in self._jit_cache:
            return self._jit_cache[key]
        import jax
        import jax.numpy as jnp
        from .generation.logits import TimestampState
        from .models.whisper import cross_kv, decode, encode, init_cache

        cfg, dtype = self.cfg, self.dtype
        t_buf, t_store = self.t_buf, self.t_store
        ns_id = self.opts.no_speech_token_id
        spec = self.spec
        draft = self.assistant is not None
        d_cfg = self.assistant[1] if draft else None

        def admit(params, d_params, state, mels, prompts, plens, budgets,
                  use_ts, lanes, temps=None, topks=None, keys=None):
            enc = encode(params["encoder"], cfg, mels, dtype=dtype)
            cross_new = cross_kv(params["decoder"], cfg, enc)
            cache_new = init_cache(cfg, a, dtype=dtype, max_len=t_buf)
            lg, cache_new = decode(params["decoder"], cfg, prompts,
                                   cross=cross_new, cache=cache_new,
                                   pos_offset=0, dtype=dtype)
            last = jnp.take_along_axis(
                lg, (plens - 1)[:, None, None], axis=1)[:, 0]
            last = last.astype(jnp.float32)
            if ns_id is not None:
                probs0 = jax.nn.softmax(lg[:, 0].astype(jnp.float32), -1)
                no_speech = probs0[:, ns_id]
            else:
                no_speech = jnp.zeros((a,), jnp.float32)

            def scatter_rows(full, new):
                return full.at[:, lanes].set(new.astype(full.dtype))

            rows = jnp.full((a, t_buf), cfg.pad_token_id, jnp.int32)
            rows = jax.lax.dynamic_update_slice(rows, prompts, (0, 0))
            new = dict(
                cache=jax.tree.map(scatter_rows, state["cache"], cache_new),
                cross=jax.tree.map(scatter_rows, state["cross"], cross_new),
                tokens=state["tokens"].at[lanes].set(rows),
                last_logits=state["last_logits"].at[lanes].set(last),
                ts=TimestampState(
                    prev=state["ts"].prev.at[lanes].set(-1),
                    prevprev=state["ts"].prevprev.at[lanes].set(-1),
                    last_ts=state["ts"].last_ts.at[lanes].set(0)),
                use_ts=state["use_ts"].at[lanes].set(use_ts),
                prompt_len=state["prompt_len"].at[lanes].set(plens),
                budget=state["budget"].at[lanes].set(
                    jnp.minimum(budgets, t_store - plens)),
                pos=state["pos"].at[lanes].set(plens),
                finished=state["finished"].at[lanes].set(False),
                sum_logprobs=state["sum_logprobs"].at[lanes].set(0.0),
                no_speech_prob=state["no_speech_prob"].at[lanes].set(
                    no_speech),
            )
            if not spec:
                new.update(
                    temp=state["temp"].at[lanes].set(temps),
                    topk=state["topk"].at[lanes].set(topks),
                    rng=state["rng"].at[lanes].set(keys),
                )
            if spec:
                new.update(
                    drafted=state["drafted"].at[lanes].set(0),
                    accepted=state["accepted"].at[lanes].set(0),
                )
            if draft:
                d_enc = (enc if d_cfg.d_model == cfg.d_model
                         else encode(d_params["encoder"], d_cfg, mels,
                                     dtype=dtype))
                d_cross_new = cross_kv(d_params["decoder"], d_cfg, d_enc)
                d_cache_new = init_cache(d_cfg, a, dtype=dtype,
                                         max_len=t_buf)
                _, d_cache_new = decode(d_params["decoder"], d_cfg, prompts,
                                        cross=d_cross_new, cache=d_cache_new,
                                        pos_offset=0, dtype=dtype)
                new.update(
                    d_cache=jax.tree.map(scatter_rows, state["d_cache"],
                                         d_cache_new),
                    d_cross=jax.tree.map(scatter_rows, state["d_cross"],
                                         d_cross_new),
                )
            return new

        if draft:
            fn = jax.jit(admit, donate_argnums=(2,))
        else:
            base = jax.jit(
                lambda params, state, *r: admit(params, None, state, *r),
                donate_argnums=(1,))
            fn = base
        self._jit_cache[key] = fn
        return fn

    # ------------------------------------------------------------ driver
    def step(self, sampling: bool = False, gamma: Optional[int] = None):
        """Dispatch one compiled block (the ``sampling`` variant while a
        sampled lane is resident — see :meth:`_step_block`; on a
        speculative engine ``gamma`` selects the draft length for THIS
        block, <= gamma_max).  Returns the packed small-output device
        vector (fetch with :meth:`unpack`); safe to fetch AFTER further
        ``step``/``admit`` dispatches (it aliases no state)."""
        assert self._state is not None, "call init_state() first"
        if self.spec:
            blk = self._spec_block(gamma or self.gamma)
            if self.assistant is not None:
                self._state, packed = blk(
                    self.pipe.params, self.assistant[0], self._state)
            else:                      # ngram: no draft params
                self._state, packed = blk(self.pipe.params, self._state)
        else:
            self._state, packed = self._step_block(sampling)(
                self.pipe.params, self._state)
        return packed

    def unpack(self, packed):
        """packed device vector -> (finished [B] bool, pos [B], tokens
        [B, t_buf], counters) as numpy (this fetch is the device sync
        point).  ``counters`` is None in greedy mode; in speculative mode
        it is ``(drafted [B], accepted [B])`` — cumulative since each
        lane's admission."""
        b = self.lanes
        flat = np.asarray(packed)
        if self.spec:
            return (flat[:b].astype(bool), flat[b:2 * b],
                    flat[4 * b:].reshape(b, self.t_buf),
                    (flat[2 * b:3 * b], flat[3 * b:4 * b]))
        return (flat[:b].astype(bool), flat[b:2 * b],
                flat[2 * b:].reshape(b, self.t_buf), None)

    def admit(self, mels, prompts: List[List[int]],
              budgets: List[int], use_ts: List[bool],
              lanes: List[int], temps: Optional[List[float]] = None,
              top_ks: Optional[List[int]] = None,
              seeds: Optional[List[int]] = None) -> None:
        """Admit ``len(lanes)`` requests (30 s mel windows + prompts) into
        the given free lanes.  One compiled program per admission size —
        callers should bucket sizes.  ``mels`` may live on device already
        (keep them there: fetching mels to host costs ~2 MB/window of
        tunnel traffic).

        ``temps``/``top_ks``/``seeds`` set per-lane sampling (greedy engine
        only; temperature 0 = greedy — the default)."""
        import jax.numpy as jnp
        a = len(lanes)
        assert a == len(prompts) == len(budgets) == len(use_ts) == len(mels)
        pad = self.cfg.pad_token_id
        prom = np.full((a, self.p_max), pad, np.int32)
        plens = np.zeros((a,), np.int32)
        for i, p in enumerate(prompts):
            prom[i, :len(p)] = p
            plens[i] = len(p)
        rest = (jnp.asarray(mels).astype(self.dtype),
                jnp.asarray(prom), jnp.asarray(plens),
                jnp.asarray(budgets, np.int32), jnp.asarray(use_ts, bool),
                jnp.asarray(lanes, np.int32))
        if self.spec:
            assert not (temps and any(t > 0 for t in temps)), \
                "sampling lanes are fallback-routed under a speculative engine"
            if self.assistant is not None:
                self._state = self._admit_fn(a)(
                    self.pipe.params, self.assistant[0], self._state, *rest)
            else:                      # ngram: greedy-shaped admit
                self._state = self._admit_fn(a)(
                    self.pipe.params, self._state, *rest)
            return
        temps = temps or [0.0] * a
        top_ks = top_ks or [0] * a
        # raw threefry key data: [hi32, lo32] of the seed (a stable
        # per-request stream; host-constructed so admission never pays
        # a device round-trip for PRNGKey)
        keys = np.zeros((a, 2), np.uint32)
        for i, sd in enumerate(seeds or [0] * a):
            keys[i, 0] = (int(sd) >> 32) & 0xFFFFFFFF
            keys[i, 1] = int(sd) & 0xFFFFFFFF
        self._state = self._admit_fn(a)(
            self.pipe.params, self._state, *rest,
            jnp.asarray(temps, jnp.float32),
            jnp.asarray(top_ks, jnp.int32), jnp.asarray(keys))


@dataclass
class _EngineRequest:
    audio: np.ndarray
    language: Optional[str]
    task: str
    return_timestamps: Any                  # False | True | "word"
    max_new_tokens: Optional[int]
    done: threading.Event
    mode: str = "chunked"                   # long-form algorithm (or "sequential")
    num_beams: int = 1                      # beam search width (1 = greedy)
    temperature: float = 0.0                # 0 = greedy; >0 = sampling
    top_k: int = 0                          # 0 = full vocab (sampling only)
    seed: Optional[int] = None              # PRNG seed (sampling only)
    result: Optional[Dict[str, Any]] = None
    error: Optional[str] = None
    # set by the client thread when it stops waiting (timeout / stream
    # disconnect): pending copies are dropped at admission and inflight
    # lanes are reclaimed between blocks (re-admission scatters fresh state
    # over every per-lane field, so an orphaned still-decoding lane is
    # harmless — it costs the same HBM traffic free or busy)
    cancelled: bool = False
    _plen: int = 0                 # prompt length, for the tokens_out stat
    # streaming: partial results are pushed here once per step-block;
    # a ``{"final": True}`` entry (or an ``error`` + done) terminates
    stream: Optional["queue.Queue"] = None
    _last_partial: str = ""
    # long-form: a >30 s request is split into strided 30 s windows that
    # ride lanes like any short request (chunked long-form is independent
    # across windows; the merge happens at completion).  Children carry
    # ``parent``/``chunk_index``; the parent holds the assembly state.
    parent: Optional["_EngineRequest"] = None
    chunk_index: int = -1
    _chunk_tokens: Optional[List[Optional[list]]] = None
    _chunk_strides: Optional[List[tuple]] = None
    _chunks_left: int = 0
    _stream_upto: int = 0
    # admission featurisation (producer thread): the window's mel
    # [1, n_mels, 3000] already on device, so the step loop never waits on
    # host prep / the language-detect fetch
    _mel: Any = None


class ContinuousTranscriber:
    """Drop-in alternative to :class:`...serving.BatchingTranscriber` backed
    by the continuous-batching engine: same ``submit()`` contract (so
    :func:`...serving.make_http_server` serves either), but finished lanes
    are refilled from the queue between step-blocks instead of waiting for
    the whole batch.
    """

    def __init__(self, pipe, batch_size: Optional[int] = None,
                 max_wait_ms: float = 0.0, default_language=None,
                 max_new_tokens: Optional[int] = None,
                 block_steps: int = 16,
                 max_queue: Optional[int] = None,
                 assistant=None, gamma: int = 5,
                 synthetic_acceptance: Optional[float] = None,
                 adaptive_gamma: bool = False,
                 ngram_speculative: bool = False, max_ngram: int = 3,
                 synthetic_period: Optional[int] = None,
                 draft_cost: Optional[float] = None):
        del max_wait_ms  # admission happens every block; no batching window
        self.pipe = pipe
        self.default_language = default_language
        self.max_new_tokens = int(max_new_tokens or pipe.max_new_tokens)
        # speculative decoding ON THE LANES (``assistant`` = (draft_params,
        # draft_cfg)): every block round drafts gamma tokens and verifies
        # them with one wide teacher decode per lane — in-flight batching
        # and draft-assisted decoding compose (beyond the reference, whose
        # speculative path is batch-1 offline).  Timestamp requests ride
        # the same lanes: the Whisper FSM runs per verify column inside
        # the block (generation.speculative semantics).
        self.engine = ContinuousBatchingEngine(
            pipe, lanes=batch_size or pipe.batch_size,
            block_steps=block_steps, max_new_tokens=self.max_new_tokens,
            assistant=assistant, gamma=gamma,
            synthetic_acceptance=synthetic_acceptance,
            ngram_speculative=ngram_speculative, max_ngram=max_ngram,
            synthetic_period=synthetic_period)
        self.batch_size = self.engine.lanes
        # backlog bound, in 30 s windows waiting for a lane; None -> 8
        # full refills deep.  0 is honoured (shed everything — drain mode).
        self.max_queue = (8 * self.batch_size if max_queue is None
                          else int(max_queue))
        self._q: "queue.Queue[Optional[_EngineRequest]]" = queue.Queue()
        # raw requests (_q) are featurised (mel + language detect) on a
        # producer thread and land here ready to admit — the step loop
        # never blocks on host prep or the language-detect fetch
        self._ready: "queue.Queue[Optional[_EngineRequest]]" = queue.Queue()
        self._featurizer: Optional[threading.Thread] = None
        # A/B knob: DWT_INLINE_ADMISSION=1 reverts to featurising on the
        # step-loop thread (the pre-producer-thread behavior) — the
        # featurizer thread only routes.  Exists so the overlap win is
        # measurable with one env var (scripts/bench_server.py).
        self._inline_admission = bool(int(
            os.environ.get("DWT_INLINE_ADMISSION", "0")))
        self._worker: Optional[threading.Thread] = None
        self._pending: List[_EngineRequest] = []
        self._inflight: Dict[int, _EngineRequest] = {}
        self._free: List[int] = list(range(self.engine.lanes))
        # word-timestamp requests need the pipeline's cross-attention
        # alignment pass (not expressible as a lane): a dedicated fallback
        # thread serves them so they never stall the decode lanes
        self._fb_q: "queue.Queue[Optional[_EngineRequest]]" = queue.Queue()
        self._fb_worker: Optional[threading.Thread] = None
        from .serving import _SequentialRunner
        self._sequential = _SequentialRunner(pipe)
        self.stats = {"requests": 0, "blocks": 0, "admitted": 0,
                      "long_form": 0, "word_ts": 0, "sequential": 0,
                      "fb_batches": 0, "fb_max_batch": 0, "beam": 0,
                      "max_inflight": 0, "rejected": 0, "cancelled": 0,
                      "tokens_out": 0}
        if self.engine.spec:
            self.stats.update({"drafted": 0, "accepted": 0,
                               "ts_fallback": 0, "sampled_fallback": 0})
            # adaptive draft length: the controller walks a small ladder of
            # compiled gammas on the measured per-draft acceptance (the
            # reference's gamma is a fixed flag; acceptance varies per
            # domain/speaker, and the optimal draft length with it)
            self.adaptive_gamma = bool(adaptive_gamma)
            g0 = self.engine.gamma
            self._gamma_levels = sorted({max(1, g0 // 2), g0,
                                         min(self.engine.gamma_max, 2 * g0)})
            self._gamma_idx = self._gamma_levels.index(g0)
            self._ctrl_d = 0
            self._ctrl_a = 0
            self._est_ema = None
            # draft/teacher decode cost ratio for the cost-aware rung
            # picker (serving.optimal_gamma); layer-count proxy, 0 for
            # the draft-free ngram lookup
            if draft_cost is not None:
                self._draft_cost = float(draft_cost)
            elif self.engine.ngram:
                self._draft_cost = 0.0
            else:
                self._draft_cost = (
                    self.engine.assistant[1].decoder_layers
                    / max(pipe.cfg.decoder_layers, 1))
            self._lane_ctr: Dict[int, tuple] = {}
            self.stats.update({"gamma_current": g0, "gamma_raises": 0,
                               "gamma_drops": 0})
        else:
            self.adaptive_gamma = False
            self.stats["sampled"] = 0
        # server-derived seeds for sampled requests that don't pin their own
        self._sample_counter = 0
        self._sample_lock = threading.Lock()
        # sampled lanes currently resident (worker-thread-owned): while > 0
        # the engine dispatches its sampling step-block variant; greedy-only
        # traffic runs the unchanged greedy program
        self._sampled_inflight = 0

    # ------------------------------------------------------------- client
    def start(self) -> "ContinuousTranscriber":
        self.engine.init_state()
        self._featurizer = threading.Thread(target=self._run_featurizer,
                                            daemon=True,
                                            name="admission-featurizer")
        self._featurizer.start()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="continuous-transcriber")
        self._worker.start()
        return self

    def stop(self) -> None:
        if self._worker is not None:
            self._q.put(None)
            if self._featurizer is not None:
                self._featurizer.join(timeout=60)
                self._featurizer = None
            self._worker.join(timeout=60)
            self._worker = None
        if self._fb_worker is not None:
            self._fb_q.put(None)
            self._fb_worker.join(timeout=60)
            self._fb_worker = None

    def submit(self, audio, language: Optional[str] = None,
               task: str = "transcribe", return_timestamps: bool = False,
               timeout: Optional[float] = None,
               max_new_tokens: Optional[int] = None,
               mode: str = "chunked", num_beams: int = 1,
               temperature: float = 0.0, top_k: int = 0,
               seed: Optional[int] = None) -> Dict[str, Any]:
        req = self._make_request(audio, language, task, return_timestamps,
                                 max_new_tokens, mode, num_beams,
                                 temperature, top_k, seed)
        self._enqueue(req)
        if not req.done.wait(timeout):
            self._cancel(req)
            raise TimeoutError("transcription timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result

    def _make_request(self, audio, language, task, return_timestamps,
                      max_new_tokens, mode, num_beams, temperature, top_k,
                      seed, stream=None) -> _EngineRequest:
        """Shared admission-time validation for both waiting styles."""
        from .audio.io import load_audio
        wav = load_audio(audio, self.pipe.cfg.sampling_rate)
        from .serving import (_coerce_beams, _coerce_mode, _coerce_sampling,
                              _coerce_timestamps)
        ts = _coerce_timestamps(return_timestamps)
        beams = _coerce_beams(num_beams)
        md = _coerce_mode(mode, ts)
        temp, k = _coerce_sampling(temperature, top_k, beams, md, ts)
        if temp > 0:
            if len(wav) > self.pipe.cfg.n_samples:
                raise ValueError(
                    "sampling (temperature > 0) applies to single-window "
                    "(<=30 s) requests; long-form decoding is greedy/beam "
                    "per the reference protocol")
            if k > self.engine.k_max:
                raise ValueError(
                    f"top_k={k} exceeds this server's compiled-in maximum "
                    f"{self.engine.k_max} (engine top_k_max)")
        return _EngineRequest(wav, language or self.default_language, task,
                              ts, max_new_tokens, threading.Event(),
                              mode=md, num_beams=beams, temperature=temp,
                              top_k=k,
                              seed=None if seed is None else int(seed),
                              stream=stream)

    def _enqueue(self, req: _EngineRequest) -> None:
        # backlog = raw queue + featurised-but-unadmitted windows + split
        # windows waiting for a lane (reads of worker-owned lists from the
        # client thread are approximate — fine for load shedding, which
        # only needs to bound growth)
        if (self._q.qsize() + self._ready.qsize() + len(self._pending)
                + self._fb_q.qsize()) >= self.max_queue:
            self.stats["rejected"] += 1
            from .serving import ServerOverloadedError
            raise ServerOverloadedError(
                f"request backlog at max_queue={self.max_queue}")
        self._q.put(req)

    def _cancel(self, req: _EngineRequest) -> None:
        if not req.done.is_set() and not req.cancelled:
            req.cancelled = True
            self.stats["cancelled"] += 1

    def snapshot(self) -> Dict[str, Any]:
        """Live observability view (GET /v1/stats)."""
        snap = {"scheduler": "continuous",
                "queue_depth": self._q.qsize(),
                "ready_depth": self._ready.qsize(),
                "fallback_depth": self._fb_q.qsize(),
                "pending_windows": len(self._pending),
                "inflight": len(self._inflight),
                "free_lanes": len(self._free),
                "lanes": self.engine.lanes,
                "max_queue": self.max_queue,
                "stats": dict(self.stats)}
        if self.engine.spec:
            snap["speculative"] = {
                "method": "ngram" if self.engine.ngram else "draft",
                "gamma": self.engine.gamma,
                "gamma_current": self.stats["gamma_current"],
                "adaptive": self.adaptive_gamma,
                "acceptance_rate": round(
                    self.stats["accepted"] / self.stats["drafted"], 3)
                if self.stats["drafted"] else None}
            if self.adaptive_gamma:
                snap["speculative"]["draft_cost"] = self._draft_cost
        return snap

    def submit_stream(self, audio, language: Optional[str] = None,
                      task: str = "transcribe",
                      return_timestamps: bool = False,
                      timeout: Optional[float] = None,
                      max_new_tokens: Optional[int] = None,
                      mode: str = "chunked", num_beams: int = 1,
                      temperature: float = 0.0, top_k: int = 0,
                      seed: Optional[int] = None):
        """Streaming transcription: yields ``{"text": ..., "final": False}``
        partials as the lane decodes (once per step-block when the text
        grew), then the full result dict with ``final: True``.

        In-flight batching makes this nearly free: every step-block fetch
        already carries every lane's token buffer, so partial decoding is
        host-side work only.  Long-form (>30 s) inputs fall back to the
        chunked pipeline and yield a single final result.

        A plain function (NOT a generator): admission — audio decode,
        argument validation, the backlog bound — runs HERE, before the HTTP
        layer has committed a 200 + ndjson headers, so
        :class:`...serving.ServerOverloadedError` maps to 503 + Retry-After
        exactly like the blocking path."""
        req = self._make_request(audio, language, task, return_timestamps,
                                 max_new_tokens, mode, num_beams,
                                 temperature, top_k, seed,
                                 stream=queue.Queue())
        self._enqueue(req)

        def _gen():
            try:
                while True:
                    try:
                        item = req.stream.get(timeout=timeout)
                    except queue.Empty:
                        raise TimeoutError(
                            "transcription timed out") from None
                    if item is None:  # terminated by error
                        raise RuntimeError(req.error or "stream aborted")
                    yield item
                    if item.get("final"):
                        return
            finally:
                # consumer stopped early (timeout, client disconnect ->
                # generator.close(), or an error): stop decoding for it
                if not req.done.is_set():
                    self._cancel(req)

        return _gen()

    # ---------------------------------------------------- admission producer
    def _run_featurizer(self) -> None:
        """Admission featurisation OFF the step-loop thread: routing
        (word-ts/sequential → fallback, long files → window split), the
        audio→mel dispatch and language detection (a blocking device fetch)
        all run here, overlapped with the engine's step blocks — lanes
        never wait on host prep.  The step loop consumes ready-to-admit
        windows from ``_ready`` (device calls from two threads are safe:
        JAX serialises dispatch and no donated buffer is shared)."""
        while True:
            req = self._q.get()
            if req is None:
                self._ready.put(None)
                return
            self.stats["requests"] += 1
            try:
                if (req.return_timestamps == "word"
                        or req.mode == "sequential"
                        or req.num_beams > 1
                        or (self.engine.spec and req.temperature > 0)):
                    # word timestamps need the pipeline's cross-attention
                    # alignment pass; sequential long-form is a host-driven
                    # sliding window with a fallback ladder; in speculative
                    # mode sampling cannot ride the accept/verify lanes
                    # (the verify contract is argmax agreement) — the
                    # fallback thread serves these and lanes never stall.
                    # Segment-timestamp requests RIDE the speculative lanes
                    # (per-column FSM in the verify pass, _build_spec_block)
                    self.stats["word_ts" if req.return_timestamps == "word"
                               else "sequential" if req.mode == "sequential"
                               else "beam" if req.num_beams > 1
                               else "sampled_fallback"] += 1
                    self._ensure_fb_worker()
                    self._fb_q.put(req)
                    continue
                children = (self._split_long(req)
                            if len(req.audio) > self.pipe.cfg.n_samples
                            else [req])
                for c in children:
                    if (not self._inline_admission
                            and not (c.parent or c).cancelled):
                        self._featurise(c)
                    self._ready.put(c)
            except Exception as e:  # noqa: BLE001
                logger.exception("admission featurisation failed")
                self._finish_req(req, error=f"{type(e).__name__}: {e}")

    def _featurise(self, r: _EngineRequest) -> None:
        """Compute the window's mel on device and resolve its language
        (idempotent — admission calls it again only if ``_mel`` is unset,
        e.g. for requests injected by white-box tests)."""
        from .audio import compute_mel
        import jax.numpy as jnp
        if r._mel is None:
            wav = np.zeros((1, self.pipe.cfg.n_samples), np.float32)
            wav[0, :len(r.audio)] = r.audio
            r._mel = compute_mel(jnp.asarray(wav), self.pipe.cfg)
        tok = self.pipe.tokenizer
        if r.language is None and len(tok.lang_to_id) > 1:
            r.language = self.pipe.detect_language(
                r._mel.astype(self.pipe.dtype))[0]

    # --------------------------------------------------------------- worker
    def _drain_ready(self, block: bool) -> bool:
        """Move featurised windows into the pending list.  Returns False
        when the shutdown sentinel was seen.  ``block`` waits for the first
        item (the engine is idle — nothing to step)."""
        first = block
        while True:
            try:
                req = self._ready.get() if first else self._ready.get_nowait()
            except queue.Empty:
                return True
            first = False
            if req is None:
                return False
            self._pending.append(req)

    def _split_long(self, r: _EngineRequest) -> List[_EngineRequest]:
        """Split a >30 s request into strided windows admitted as ordinary
        lane requests (same chunk math as the pipeline, pipeline._chunk) —
        the file transcribes in parallel across free lanes instead of
        blocking the engine behind a whole-file pipeline call.  Returns the
        per-window children (the featurizer pushes them to ``_ready``)."""
        from .audio import compute_mel
        import jax.numpy as jnp
        self.stats["long_form"] += 1
        tok = self.pipe.tokenizer
        chunks = self.pipe._chunk(r.audio, 30.0, None)
        if r.language is None and len(tok.lang_to_id) > 1:
            # one language for the whole file, detected from the first
            # window (pipeline semantics)
            wav0 = np.zeros((1, self.pipe.cfg.n_samples), np.float32)
            w = chunks[0]["audio"][:self.pipe.cfg.n_samples]
            wav0[0, :len(w)] = w
            mel0 = compute_mel(jnp.asarray(wav0), self.pipe.cfg)
            r.language = self.pipe.detect_language(
                mel0.astype(self.pipe.dtype))[0]
        r._chunk_tokens = [None] * len(chunks)
        r._chunk_strides = [c["stride"] for c in chunks]
        r._chunks_left = len(chunks)
        return [_EngineRequest(
            c["audio"], r.language, r.task, r.return_timestamps,
            r.max_new_tokens, threading.Event(), parent=r,
            chunk_index=i) for i, c in enumerate(chunks)]

    def _admit_pending(self) -> None:
        """Admit featurised requests into free lanes, in power-of-two chunks
        so only log2(lanes)+1 admission programs ever compile.  Mels arrive
        precomputed from the featurizer thread; the step loop only stacks
        them (one device concatenate) and dispatches the admit program."""
        import jax.numpy as jnp
        eng, tok = self.engine, self.pipe.tokenizer
        # drop windows whose client stopped waiting before they got a lane
        self._pending = [r for r in self._pending
                         if not (r.parent or r).cancelled]
        while self._pending and self._free:
            n = min(len(self._pending), len(self._free))
            a = 1 << (n.bit_length() - 1)      # largest power of two <= n
            reqs = [self._pending.pop(0) for _ in range(a)]
            lanes = [self._free.pop(0) for _ in range(a)]
            for r in reqs:
                self._featurise(r)  # no-op unless injected unprepared
            mels = (reqs[0]._mel if a == 1
                    else jnp.concatenate([r._mel for r in reqs], axis=0))
            prompts = [tok.prompt_ids(language=r.language, task=r.task,
                                      no_timestamps=not r.return_timestamps)
                       for r in reqs]
            budgets = [max(1, min(int(r.max_new_tokens
                                      or self.max_new_tokens),
                                  self.max_new_tokens)) for r in reqs]
            if eng.spec:
                eng.admit(mels, prompts, budgets,
                          [r.return_timestamps for r in reqs], lanes)
            else:
                seeds = []
                for r in reqs:
                    if r.temperature > 0 and r.seed is None:
                        with self._sample_lock:
                            r.seed = self._sample_counter
                            self._sample_counter += 1
                    seeds.append(r.seed or 0)
                    if r.temperature > 0:
                        self.stats["sampled"] += 1
                        self._sampled_inflight += 1
                eng.admit(mels, prompts, budgets,
                          [r.return_timestamps for r in reqs], lanes,
                          temps=[r.temperature for r in reqs],
                          top_ks=[r.top_k for r in reqs], seeds=seeds)
            for i, (lane, r) in enumerate(zip(lanes, reqs)):
                r._plen = len(prompts[i])
                r._mel = None  # free the device buffer
                self._inflight[lane] = r
            self.stats["admitted"] += a
            self.stats["max_inflight"] = max(self.stats["max_inflight"],
                                             len(self._inflight))

    @staticmethod
    def _finish_req(r: _EngineRequest, result: Optional[Dict[str, Any]] = None,
                    error: Optional[str] = None) -> None:
        """Deliver a request's terminal state to both waiting styles
        (blocking ``submit`` and the ``submit_stream`` queue)."""
        if error is not None:
            r.error = error
            if r.stream is not None:
                r.stream.put(None)
        else:
            r.result = result
            if r.stream is not None:
                r.stream.put({**result, "final": True})
        r.done.set()

    def _complete(self, block_out) -> None:
        """Fetch a step-block's outputs: finish completed lanes and emit
        streaming partials for lanes still running.

        ``block_out`` is ``(packed, snapshot)`` where snapshot is the
        inflight map AT DISPATCH TIME: a lane freed and re-admitted after
        this block was dispatched still carries the old occupant's stale
        ``finished`` flag — the snapshot identity check skips it (the new
        request completes from a later block)."""
        tok = self.pipe.tokenizer
        packed, snap = block_out
        finished, pos, tokens, counters = self.engine.unpack(packed)
        if counters is not None and self.adaptive_gamma:
            self._update_gamma_controller(snap, counters)
        for lane, r in list(self._inflight.items()):
            if snap.get(lane) is not r:
                continue  # admitted after this block was dispatched
            ids = tokens[lane][:pos[lane]].tolist()
            if not finished[lane]:
                if r.stream is not None:
                    text = tok.decode(ids, skip_special_tokens=True)
                    if text != r._last_partial:
                        r._last_partial = text
                        r.stream.put({"text": text, "final": False})
                continue
            self._inflight.pop(lane)
            self._free.append(lane)
            if r.temperature > 0:
                self._sampled_inflight -= 1
            self.stats["tokens_out"] += max(0, int(pos[lane]) - r._plen)
            if counters is not None:
                self.stats["drafted"] += int(counters[0][lane])
                self.stats["accepted"] += int(counters[1][lane])
                self._lane_ctr.pop(lane, None)
            try:
                if r.parent is not None:
                    self._finish_chunk(r, ids)
                    continue
                result = {"text": tok.decode(ids, skip_special_tokens=True)}
                if r.return_timestamps:
                    _, opt = tok.decode_asr([{"tokens": ids}],
                                            return_timestamps=True)
                    result.update(opt)
                self._finish_req(r, result)
            except Exception as e:  # noqa: BLE001
                logger.exception("engine request postprocessing failed")
                self._finish_req(r.parent or r,
                                 error=f"{type(e).__name__}: {e}")

    def _finish_chunk(self, r: _EngineRequest, ids: list) -> None:
        """A long-form window completed: record it on the parent; when every
        window is in, merge with the strided decode_asr algorithm (exactly
        the pipeline's multi-chunk branch).  A streaming parent gets a
        partial merge whenever the completed prefix grows."""
        tok = self.pipe.tokenizer
        p = r.parent
        p._chunk_tokens[r.chunk_index] = ids
        p._chunks_left -= 1
        r.done.set()
        if p.error is not None or p.result is not None:
            return  # parent already terminated (a sibling failed)
        if p._chunks_left == 0:
            outputs = [{"tokens": t, "stride": s}
                       for t, s in zip(p._chunk_tokens, p._chunk_strides)]
            text, optional = tok.decode_asr(
                outputs, return_timestamps=p.return_timestamps)
            self._finish_req(p, {"text": text, **optional})
            return
        if p.stream is not None:
            k = 0
            while (k < len(p._chunk_tokens)
                   and p._chunk_tokens[k] is not None):
                k += 1
            if k > p._stream_upto:
                p._stream_upto = k
                outputs = [{"tokens": t, "stride": s}
                           for t, s in zip(p._chunk_tokens[:k],
                                           p._chunk_strides[:k])]
                text, _ = tok.decode_asr(
                    outputs, return_timestamps=p.return_timestamps)
                p.stream.put({"text": text, "final": False})

    @staticmethod
    def _estimate_accept(ratio: float, gamma: int) -> float:
        """Per-draft acceptance from the accepted/drafted ratio — shared
        with the microbatch controller (:func:`..serving.estimate_accept`)."""
        from .serving import estimate_accept
        return estimate_accept(ratio, gamma)

    def _update_gamma_controller(self, snap, counters) -> None:
        """Walk the gamma ladder on the measured per-draft acceptance.

        Counters are per-lane cumulative since admission; deltas are taken
        per (lane, request) pair so admissions (which reset the counters)
        never corrupt the window.  Once the window holds enough drafts, the
        true per-draft acceptance is recovered from the accepted/drafted
        ratio (see :meth:`_estimate_accept` — the raw ratio understates it:
        a rejected draft wastes the rest of its window) and the level moves
        ONE rung toward the cost-optimal gamma (serving.optimal_gamma —
        expected emitted tokens per round time, pricing draft steps and
        verify width) when that rung is predicted >2% better.  Token
        identity is gamma-independent, so switching is purely a throughput
        knob."""
        for lane, r in snap.items():
            if self._inflight.get(lane) is not r:
                continue  # lane re-admitted after dispatch: stale counters
            d, a = int(counters[0][lane]), int(counters[1][lane])
            rid, pd, pa = self._lane_ctr.get(lane, (None, 0, 0))
            if rid is not id(r):
                pd, pa = 0, 0
            if d >= pd:
                self._ctrl_d += d - pd
                self._ctrl_a += a - pa
            self._lane_ctr[lane] = (id(r), d, a)
        g = self._gamma_levels[self._gamma_idx]
        if self._ctrl_d < 16 * g:
            return
        est = self._estimate_accept(self._ctrl_a / self._ctrl_d, g)
        self._ctrl_d = 0
        self._ctrl_a = 0
        # EMA across windows damps estimate-noise rung oscillation (see
        # the microbatch controller's matching note)
        self._est_ema = est if self._est_ema is None else (
            0.5 * self._est_ema + 0.5 * est)
        est = self._est_ema
        from .serving import _gamma_step
        self._gamma_idx = _gamma_step(est, self._gamma_levels,
                                      self._gamma_idx, self._draft_cost,
                                      self.stats)
        self.stats["gamma_current"] = self._gamma_levels[self._gamma_idx]

    def _ensure_fb_worker(self) -> None:
        if self._fb_worker is None:
            self._fb_worker = threading.Thread(
                target=self._run_fallback, daemon=True,
                name="continuous-fallback")
            self._fb_worker.start()

    def _run_fallback(self) -> None:
        """Serve requests the lanes can't express (word-level timestamps,
        sequential long-form) off the decode path.  Queued single-window
        word-timestamp requests are MICRO-BATCHED: everything already
        waiting is drained and served in shared device calls
        (``pipe.transcribe_words_batch`` — a word-ts burst costs
        ceil(K/batch) calls, not K).  Sequential and long-form word-ts
        requests run singly (host-driven window loops).  Device calls
        interleave with the engine worker's — JAX serialises dispatch, and
        the two threads share no donated buffers (the pipeline jits own
        their inputs), so this is contention, not corruption."""
        saw_sentinel = False
        while not saw_sentinel:
            r = self._fb_q.get()
            if r is None:
                return
            batch = [r]
            while len(batch) < max(self.engine.lanes, 8):
                try:
                    nxt = self._fb_q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    saw_sentinel = True  # serve what we hold, then exit
                    break
                batch.append(nxt)
            batch = [b for b in batch if not b.cancelled]
            # word-ts singles grouped by (task, budget) -> one batched call;
            # language may vary per row (detected in-batch when missing)
            groups: Dict[Any, List[_EngineRequest]] = {}
            singles: List[_EngineRequest] = []
            for b in batch:
                if (b.return_timestamps == "word" and b.num_beams == 1
                        and len(b.audio) <= self.pipe.cfg.n_samples):
                    max_new = self.max_new_tokens
                    if b.max_new_tokens is not None:
                        max_new = max(1, min(int(b.max_new_tokens), max_new))
                    groups.setdefault((b.task, max_new), []).append(b)
                else:
                    singles.append(b)
            for (task, max_new), reqs in groups.items():
                try:
                    results = self.pipe.transcribe_words_batch(
                        [b.audio for b in reqs],
                        languages=[b.language for b in reqs],
                        task=task, max_new_tokens=max_new)
                    self.stats["fb_batches"] += 1
                    self.stats["fb_max_batch"] = max(
                        self.stats["fb_max_batch"], len(reqs))
                    for b, res in zip(reqs, results):
                        self._finish_req(b, res)
                except Exception as e:  # noqa: BLE001
                    logger.exception("fallback word-ts batch failed")
                    for b in reqs:
                        self._finish_req(b, error=f"{type(e).__name__}: {e}")
            for b in singles:
                self._run_fallback_single(b)

    def _run_fallback_single(self, r: _EngineRequest) -> None:
        try:
            if r.mode == "sequential":
                result = self._sequential.run(r.audio, r.language,
                                              r.task, r.max_new_tokens,
                                              r.num_beams)
            elif r.temperature > 0:
                result = self._run_sampled_single(r)
            else:
                max_new = self.max_new_tokens
                if r.max_new_tokens is not None:
                    max_new = max(1, min(int(r.max_new_tokens), max_new))
                gk = ({"num_beams": r.num_beams} if r.num_beams > 1
                      else None)
                result = self.pipe(r.audio, language=r.language,
                                   task=r.task,
                                   return_timestamps=r.return_timestamps,
                                   max_new_tokens=max_new,
                                   generate_kwargs=gk)
            self._finish_req(r, result)
        except Exception as e:  # noqa: BLE001
            logger.exception("fallback request failed")
            self._finish_req(r, error=f"{type(e).__name__}: {e}")

    def _run_sampled_single(self, r: _EngineRequest) -> Dict[str, Any]:
        """Sampled short-form off the lanes (speculative engines route
        sampling here — the accept/verify contract is argmax agreement):
        the pipeline's standard sampled-generate program, one request per
        call (sampling under a draft-assisted server is a rare mix)."""
        import jax
        import jax.numpy as jnp
        from .audio import compute_mel
        from .generation import GenerationOptions
        pipe, cfg, tok = self.pipe, self.pipe.cfg, self.pipe.tokenizer
        wav = np.zeros((1, cfg.n_samples), np.float32)
        wav[0, :len(r.audio)] = r.audio
        mel = compute_mel(jnp.asarray(wav), cfg).astype(pipe.dtype)
        language = r.language
        if language is None and len(tok.lang_to_id) > 1:
            language = pipe.detect_language(mel)[0]
        prompt = tok.prompt_ids(language=language, task=r.task,
                                no_timestamps=not r.return_timestamps)
        opts = GenerationOptions.from_config(
            cfg, max_new_tokens=self.max_new_tokens,
            return_timestamps=bool(r.return_timestamps),
            no_speech_token_id=tok.no_speech, do_sample=True, top_k=r.top_k)
        fn = pipe._jitted_generate(opts, len(prompt))
        if r.seed is None:
            with self._sample_lock:
                r.seed = self._sample_counter
                self._sample_counter += 1
        out = fn(pipe.params, mel, jnp.asarray([prompt], jnp.int32),
                 float(r.temperature), jax.random.PRNGKey(r.seed))
        cut = int(np.asarray(out.seq_len)[0])
        if r.max_new_tokens is not None:
            cut = min(cut, len(prompt) + max(int(r.max_new_tokens), 0))
        ids = np.asarray(out.sequences)[0][:cut].tolist()
        result = {"text": tok.decode(ids, skip_special_tokens=True)}
        if r.return_timestamps:
            _, opt = tok.decode_asr([{"tokens": ids}],
                                    return_timestamps=True)
            result.update(opt)
        return result

    def _reclaim_cancelled(self) -> None:
        """Free lanes whose occupant's client stopped waiting.  Safe without
        touching device state: admission scatters fresh values over EVERY
        per-lane field, and the stale-finish snapshot check in
        :meth:`_complete` already ignores a reclaimed lane's old occupant."""
        for lane, r in list(self._inflight.items()):
            if (r.parent or r).cancelled:
                self._inflight.pop(lane)
                self._free.append(lane)
                if r.temperature > 0:
                    self._sampled_inflight -= 1

    def _run(self) -> None:
        try:
            self._run_inner()
        except Exception as e:  # noqa: BLE001 — never leave submitters hanging
            logger.exception("continuous-batching worker crashed")
            self._abort_all(f"worker crashed: {type(e).__name__}: {e}")

    def _abort_all(self, msg: str) -> None:
        """Error out every waiting submitter (long-form children resolve to
        their parent, which is finished once)."""
        while True:  # include featurised windows not yet drained
            try:
                r = self._ready.get_nowait()
            except queue.Empty:
                break
            if r is not None:
                self._pending.append(r)
        seen = set()
        for r in self._pending + list(self._inflight.values()):
            target = r.parent or r
            if id(target) in seen:
                continue
            seen.add(id(target))
            if target.result is None and target.error is None:
                self._finish_req(target, error=msg)

    def _run_inner(self) -> None:
        prev_packed = None
        shutting_down = False
        while True:
            if not shutting_down:
                idle = (not self._inflight and not self._pending
                        and prev_packed is None)
                if not self._drain_ready(block=idle):
                    shutting_down = True
            self._reclaim_cancelled()
            self._admit_pending()
            if self._inflight:
                # pipeline two blocks deep: dispatch block k+1 before
                # fetching block k's outputs, hiding the ~30-50 ms remote
                # fetch round-trip behind device compute (completion and
                # admission then lag one block — a few ms of decode)
                gamma = (self._gamma_levels[self._gamma_idx]
                         if self.engine.spec else None)
                block_out = (self.engine.step(self._sampled_inflight > 0,
                                              gamma=gamma),
                             dict(self._inflight))
                self.stats["blocks"] += 1
                if prev_packed is not None:
                    self._complete(prev_packed)
                prev_packed = block_out if self._inflight else None
            elif prev_packed is not None:
                self._complete(prev_packed)
                prev_packed = None
            if shutting_down and not self._inflight and not self._pending \
                    and prev_packed is None:
                return
