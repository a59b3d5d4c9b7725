"""Sequential (OpenAI-style) long-form transcription with batched cursors.

The timestamp-driven sliding-window algorithm the reference reaches through HF
``generate`` (flags at reference training/run_eval.py:147-176, auto-enabled
for >30 s inputs at :726-735): decode a 30 s window, cut it into segments at
paired timestamp tokens, advance the window to the last complete segment,
optionally condition the next window on previous output, and retry each window
up the temperature ladder when its average logprob or compression ratio fails.

TPU mapping: the device program is ONE jitted ``generate`` over a fixed
``[B, n_mels, 3000]`` window batch with a fixed-size left-padded prompt
(``pad_len`` masking), so every window / every temperature / every fallback
subset reuses the same compiled program.  The host only moves cursors.
"""

from __future__ import annotations

import dataclasses
import zlib
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from ..tokenizer import WhisperTokenizer
from .beam import encode_and_beam_search
from .generate import GenerationOptions, encode_and_generate

FRAMES_PER_SECOND = 100   # mel frames per second (hop 160 @ 16 kHz)
INPUT_STRIDE = 2          # mel frames per 0.02 s timestamp unit


@dataclasses.dataclass(frozen=True)
class SequentialOptions:
    """Defaults = the reference eval defaults (BASELINE.md: fallback
    temperatures 0.0->1.0 step 0.2, logprob -1.0, no-speech 0.6,
    compression 1.35)."""
    temperatures: Tuple[float, ...] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    logprob_threshold: Optional[float] = -1.0
    no_speech_threshold: Optional[float] = 0.6
    compression_ratio_threshold: Optional[float] = 1.35
    condition_on_prev_tokens: bool = False
    prompt_reset_on_temperature: float = 0.5
    max_new_tokens: int = 224
    max_initial_timestamp_index: Optional[int] = 50
    # Beam search at the temperature-0 rung only; fallback rungs sample with
    # one beam (HF generate_with_fallback sets do_sample = t > 0 and forces
    # num_beams = 1 when sampling — the combination the reference exposes by
    # passing num_beams straight into sequential generate,
    # training/run_eval.py:690-718).
    num_beams: int = 1
    length_penalty: float = 1.0


def compression_ratio(text: str) -> float:
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


class SequentialTranscriber:
    """Host orchestrator around one jitted window-generate program."""

    def __init__(self, params, cfg: WhisperConfig, tokenizer: WhisperTokenizer,
                 opts: SequentialOptions = SequentialOptions(),
                 language: Optional[str] = None, task: str = "transcribe",
                 batch_size: int = 8, dtype=jnp.float32,
                 speculative_method: Optional[str] = None,
                 assistant=None, gamma: int = 5, max_ngram: int = 3):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.opts = opts
        self.batch_size = batch_size
        self.dtype = dtype
        # Speculative decoding at the temperature-0 rung (the rung that
        # serves nearly every window in practice): "draft" = assistant-model
        # speculation, "ngram" = draft-free prompt lookup.  Both are
        # token-identical to the greedy program they replace (the timestamp
        # FSM runs per verify column — generation.speculative), so the
        # fallback ladder's accept/retry decisions are unchanged.  Prompt
        # lookup pays most HERE: with condition_on_prev the prompt embeds
        # the previous window's text verbatim — a ready-made n-gram source.
        # Fallback rungs (t > 0) sample and cannot ride the argmax-agreement
        # verify contract; they use the plain sampling program.
        if speculative_method not in (None, "draft", "ngram"):
            raise ValueError(f"unknown speculative_method "
                             f"{speculative_method!r}; use 'draft' or 'ngram'")
        if speculative_method == "draft" and assistant is None:
            raise ValueError("speculative_method='draft' requires "
                             "assistant=(draft_params, draft_cfg)")
        if speculative_method == "ngram" and assistant is not None:
            raise ValueError("pick ONE speculation method: assistant draft "
                             "or ngram lookup")
        if speculative_method and opts.num_beams > 1:
            raise ValueError("speculative decoding verifies greedy argmax "
                             "agreement; it does not compose with beam "
                             "search (num_beams > 1)")
        self.spec_method = speculative_method
        self.assistant = assistant
        self.gamma = int(gamma)
        self.max_ngram = int(max_ngram)
        self.spec_stats = {"drafted": 0, "accepted": 0, "rounds": 0}
        self.base_prompt = tokenizer.prompt_ids(language=language, task=task,
                                                no_timestamps=False)
        # fixed prompt layout: [pad ... pad | <|startofprev|> ctx... | base]
        self.ctx_budget = (cfg.max_target_positions // 2 - 1
                           if opts.condition_on_prev_tokens else 0)
        self.prompt_len = len(self.base_prompt) + (
            self.ctx_budget + 1 if opts.condition_on_prev_tokens else 0)
        max_new = min(opts.max_new_tokens,
                      cfg.max_target_positions - self.prompt_len)
        self._gen_opts = {}
        for do_sample in (False, True):
            self._gen_opts[do_sample] = GenerationOptions.from_config(
                cfg, max_new_tokens=max_new, do_sample=do_sample,
                return_timestamps=True,
                max_initial_timestamp_index=opts.max_initial_timestamp_index,
                no_speech_token_id=tokenizer.no_speech)
        self._jit_cache: Dict[bool, Any] = {}

    def _fn(self, do_sample: bool):
        if do_sample not in self._jit_cache:
            gen_opts = self._gen_opts[do_sample]

            sot_slot = self.prompt_len - len(self.base_prompt)

            if not do_sample and self.spec_method:
                fn = self._build_spec_fn(gen_opts, sot_slot)
            else:
                def fn(params, mel, prompts, pad_len, temperature, rng):
                    return encode_and_generate(
                        params, self.cfg, mel, prompts, gen_opts,
                        temperature=temperature, rng=rng, pad_len=pad_len,
                        sot_slot=sot_slot, dtype=self.dtype)
                fn = jax.jit(fn)
            self._jit_cache[do_sample] = fn
        return self._jit_cache[do_sample]

    def _build_spec_fn(self, gen_opts: GenerationOptions, sot_slot: int):
        """Speculative window program for the t=0 rung — same call shape as
        the greedy program (temperature/rng accepted and ignored: the verify
        contract is deterministic argmax agreement).  Lanes ride the batched
        vmap paths so every window in the group speculates independently."""
        from ..models.whisper import encode as encode_fn, cross_kv
        from .speculative import (speculative_generate_batched,
                                  ngram_speculative_generate_batched)
        cfg, dtype = self.cfg, self.dtype
        gamma, max_ngram = self.gamma, self.max_ngram

        if self.spec_method == "ngram":
            @jax.jit
            def spec(params, mel, prompts, pad_len):
                enc = encode_fn(params["encoder"], cfg, mel, dtype=dtype)
                t_cross = cross_kv(params["decoder"], cfg, enc)
                return ngram_speculative_generate_batched(
                    params["decoder"], cfg, t_cross, prompts, gen_opts,
                    gamma=gamma, max_ngram=max_ngram, dtype=dtype,
                    pad_len=pad_len, sot_slot=sot_slot)

            def fn(params, mel, prompts, pad_len, temperature, rng):
                return spec(params, mel, prompts, pad_len)
            return fn

        d_cfg = self.assistant[1]

        @jax.jit
        def spec(params, d_params, mel, prompts, pad_len):
            enc = encode_fn(params["encoder"], cfg, mel, dtype=dtype)
            t_cross = cross_kv(params["decoder"], cfg, enc)
            # distil drafts share the teacher encoder when widths match
            # (reference run_eval.py:585-599)
            d_enc = (enc if d_cfg.d_model == cfg.d_model
                     else encode_fn(d_params["encoder"], d_cfg, mel,
                                    dtype=dtype))
            d_cross = cross_kv(d_params["decoder"], d_cfg, d_enc)
            return speculative_generate_batched(
                params["decoder"], cfg, d_params["decoder"], d_cfg,
                t_cross, d_cross, prompts, gen_opts, gamma=gamma,
                dtype=dtype, pad_len=pad_len, sot_slot=sot_slot)

        def fn(params, mel, prompts, pad_len, temperature, rng):
            return spec(params, self.assistant[0], mel, prompts, pad_len)
        return fn

    def _beam_fn(self):
        """Beam program for the temperature-0 rung (opts.num_beams > 1)."""
        if "beam" not in self._jit_cache:
            gen_opts = self._gen_opts[False]
            sot_slot = self.prompt_len - len(self.base_prompt)
            k, lp = self.opts.num_beams, self.opts.length_penalty

            def fn(params, mel, prompts, pad_len):
                return encode_and_beam_search(
                    params, self.cfg, mel, prompts, gen_opts, num_beams=k,
                    length_penalty=lp, sot_slot=sot_slot, pad_len=pad_len,
                    dtype=self.dtype)
            self._jit_cache["beam"] = jax.jit(fn)
        return self._jit_cache["beam"]

    # ------------------------------------------------------------------
    def _build_prompt(self, prev_tokens: List[int]) -> Tuple[List[int], int]:
        """(fixed-length prompt, pad_len) with prev context left-padded."""
        if not self.opts.condition_on_prev_tokens:
            return list(self.base_prompt), 0
        ctx = prev_tokens[-self.ctx_budget:] if prev_tokens else []
        prev = [self.tok.sot_prev] + ctx if ctx else []
        pad = self.prompt_len - len(prev) - len(self.base_prompt)
        return ([self.cfg.pad_token_id] * pad + prev + list(self.base_prompt),
                pad)

    def _run_window(self, mels: np.ndarray, prompts: np.ndarray,
                    pads: np.ndarray, temperature: float, rng) -> Dict[str, Any]:
        """One fixed-shape device call (padding the batch to batch_size)."""
        n = len(mels)
        bsz = self.batch_size
        if n < bsz:
            mels = np.concatenate([mels, np.zeros((bsz - n,) + mels.shape[1:],
                                                  mels.dtype)])
            prompts = np.concatenate([prompts,
                                      np.tile(prompts[:1], (bsz - n, 1))])
            pads = np.concatenate([pads, np.tile(pads[:1], bsz - n)])
        if temperature == 0 and self.opts.num_beams > 1:
            # beam at the t=0 rung only; fallback rungs sample with 1 beam
            # (HF generate_with_fallback semantics)
            out = self._beam_fn()(self.params, jnp.asarray(mels, self.dtype),
                                  jnp.asarray(prompts, jnp.int32),
                                  jnp.asarray(pads, jnp.int32))
        else:
            fn = self._fn(do_sample=temperature > 0)
            out = fn(self.params, jnp.asarray(mels, self.dtype),
                     jnp.asarray(prompts, jnp.int32),
                     jnp.asarray(pads, jnp.int32),
                     float(temperature), rng)
            if getattr(out, "drafted", None) is not None:
                # speculative rung: live rows only (padded lanes speculate
                # on a copied window — their counters are noise)
                self.spec_stats["drafted"] += int(
                    np.sum(np.asarray(out.drafted)[:n]))
                self.spec_stats["accepted"] += int(
                    np.sum(np.asarray(out.accepted)[:n]))
                self.spec_stats["rounds"] += int(
                    np.sum(np.asarray(out.rounds)[:n]))
        return {
            "sequences": np.asarray(out.sequences)[:n],
            "seq_len": np.asarray(out.seq_len)[:n],
            "sum_logprobs": np.asarray(out.sum_logprobs)[:n],
            "no_speech_prob": np.asarray(out.no_speech_prob)[:n],
        }

    # ------------------------------------------------------------------
    def _cut_segments(self, tokens: List[int], time_offset: float,
                      seek_num_frames: int) -> Tuple[List[Dict], int]:
        """Split a window's generated tokens at paired timestamps; return
        (segments, frames_to_advance).  Mirrors HF ``_retrieve_segment``."""
        ts_begin = self.tok.timestamp_begin
        tp = 0.02
        is_ts = [t >= ts_begin for t in tokens]
        single_ending = (len(tokens) >= 2 and is_ts[-1] and not is_ts[-2])
        pair_idx = [i + 1 for i in range(len(tokens) - 1)
                    if is_ts[i] and is_ts[i + 1]]

        segments: List[Dict] = []
        if pair_idx:
            slices = list(pair_idx)
            if single_ending:
                slices.append(len(tokens))
            else:
                slices[-1] += 1
            last = 0
            for i, cur in enumerate(slices):
                seg_tokens = tokens[last:cur]
                is_last_slice = i == len(slices) - 1
                start_pos = seg_tokens[0] - ts_begin
                end_idx = -1 if (not is_last_slice or single_ending) else -2
                end_pos = seg_tokens[end_idx] - ts_begin
                segments.append({
                    "start": time_offset + start_pos * tp,
                    "end": time_offset + end_pos * tp,
                    "tokens": seg_tokens,
                })
                last = cur
            if single_ending:
                advance = seek_num_frames
            else:
                last_ts_pos = tokens[last - 2] - ts_begin
                advance = last_ts_pos * INPUT_STRIDE
        else:
            ts = [t for t in tokens if t >= ts_begin]
            end_pos = seek_num_frames // INPUT_STRIDE
            if ts and ts[-1] != ts_begin:
                end_pos = ts[-1] - ts_begin
            segments = [{
                "start": time_offset,
                "end": time_offset + end_pos * tp,
                "tokens": tokens,
            }]
            advance = seek_num_frames
        return segments, max(advance, 1)

    # ------------------------------------------------------------------
    def transcribe(self, features: Sequence[np.ndarray],
                   rng: Optional[jax.Array] = None,
                   initial_prompt_tokens: Optional[List[int]] = None,
                   ) -> List[Dict[str, Any]]:
        """features: per-sample full-length log-mel [n_mels, total_frames].

        ``initial_prompt_tokens`` seeds the <|startofprev|> context of the
        FIRST window (the reference's prompt_ids / openai-whisper
        initial_prompt; requires ``condition_on_prev_tokens`` — the prompt
        layout reserves the context budget only then).

        Returns per sample: {"text", "segments": [{start, end, text, tokens,
        temperature, avg_logprob, compression_ratio, no_speech_prob}]}.
        """
        opts = self.opts
        if initial_prompt_tokens and not opts.condition_on_prev_tokens:
            raise ValueError("initial_prompt_tokens requires "
                             "condition_on_prev_tokens=True (the compiled "
                             "prompt layout reserves context space only "
                             "then)")
        if rng is None:
            rng = jax.random.PRNGKey(0)
        n = len(features)
        window = self.cfg.nb_max_frames  # 3000
        seeks = [0] * n
        totals = [f.shape[-1] for f in features]
        prev_tokens: List[List[int]] = [
            list(initial_prompt_tokens or []) for _ in range(n)]
        condition_flags = [opts.condition_on_prev_tokens] * n
        results: List[Dict[str, Any]] = [
            {"segments": [], "text": ""} for _ in range(n)]

        while True:
            active = [i for i in range(n) if seeks[i] < totals[i]]
            if not active:
                break
            for group_start in range(0, len(active), self.batch_size):
                group = active[group_start:group_start + self.batch_size]
                mels, prompts, pads, num_frames = [], [], [], []
                for i in group:
                    seg = features[i][:, seeks[i]:seeks[i] + window]
                    num_frames.append(seg.shape[-1])
                    if seg.shape[-1] < window:
                        seg = np.pad(seg, ((0, 0), (0, window - seg.shape[-1])))
                    mels.append(seg)
                    ptoks, pad = self._build_prompt(
                        prev_tokens[i] if condition_flags[i] else [])
                    prompts.append(ptoks)
                    pads.append(pad)
                mels = np.stack(mels).astype(np.float32)
                prompts_np = np.asarray(prompts, np.int32)
                pads_np = np.asarray(pads, np.int32)

                pending = list(range(len(group)))
                accepted: Dict[int, Dict[str, Any]] = {}
                for temperature in opts.temperatures:
                    if not pending:
                        break
                    rng, step = jax.random.split(rng)
                    out = self._run_window(mels[pending], prompts_np[pending],
                                           pads_np[pending], temperature, step)
                    still_pending = []
                    for row, g in enumerate(pending):
                        p_len = self.prompt_len if opts.condition_on_prev_tokens \
                            else len(self.base_prompt)
                        seq = out["sequences"][row][:out["seq_len"][row]]
                        gen = [int(t) for t in seq[p_len:]]
                        text = self.tok.decode(gen)
                        ratio = compression_ratio(text)
                        avg_lp = (out["sum_logprobs"][row] / max(len(gen), 1))
                        needs_fallback = False
                        if (opts.compression_ratio_threshold is not None
                                and ratio > opts.compression_ratio_threshold):
                            needs_fallback = True
                        if (opts.logprob_threshold is not None
                                and avg_lp < opts.logprob_threshold):
                            needs_fallback = True
                        if (opts.no_speech_threshold is not None
                                and out["no_speech_prob"][row] > opts.no_speech_threshold
                                and (opts.logprob_threshold is None
                                     or avg_lp < opts.logprob_threshold)):
                            needs_fallback = False  # silence: don't retry
                            gen = []
                        if needs_fallback and temperature != opts.temperatures[-1]:
                            still_pending.append(g)
                        else:
                            accepted[g] = {
                                "tokens": gen, "temperature": temperature,
                                "avg_logprob": float(avg_lp),
                                "compression_ratio": ratio,
                                "no_speech_prob": float(out["no_speech_prob"][row]),
                            }
                    pending = still_pending

                for row_g, acc in accepted.items():
                    i = group[row_g]
                    seek_num = min(window, totals[i] - seeks[i])
                    time_offset = seeks[i] / FRAMES_PER_SECOND
                    if not acc["tokens"]:  # skipped as silence
                        seeks[i] += seek_num
                        condition_flags[i] = opts.condition_on_prev_tokens
                        continue
                    segments, advance = self._cut_segments(
                        acc["tokens"], time_offset, seek_num)
                    for s in segments:
                        s.update(temperature=acc["temperature"],
                                 avg_logprob=acc["avg_logprob"],
                                 compression_ratio=acc["compression_ratio"],
                                 no_speech_prob=acc["no_speech_prob"],
                                 text=self.tok.decode(s["tokens"]))
                        results[i]["segments"].append(s)
                        kept = s["tokens"]
                        # drop a trailing paired end-timestamp from the prompt
                        # context (HF skip_ending_double_timestamps)
                        if (len(kept) >= 2
                                and kept[-1] >= self.tok.timestamp_begin
                                and kept[-2] >= self.tok.timestamp_begin):
                            kept = kept[:-1]
                        prev_tokens[i].extend(kept)
                    seeks[i] += advance
                    condition_flags[i] = (
                        opts.condition_on_prev_tokens
                        and acc["temperature"] <= opts.prompt_reset_on_temperature)
                    if not condition_flags[i]:
                        prev_tokens[i] = []

        for r in results:
            r["text"] = "".join(s["text"] for s in r["segments"])
        return results
