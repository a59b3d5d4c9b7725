"""Benchmark: batched transcription RTFx vs the reference stack, same chip.

Protocol (reference eval defaults, README.md:311-332: batch 16, bf16; the
256-token budget is the long-form/pseudo-labelling worst case the published
6.3x relative-latency headline is built on, cf. training/run_pseudo_labelling
gen_kwargs and README.md:266-275):

  * distil-large-v3 and whisper-large-v3 run the IDENTICAL program in this
    framework (mel -> flash encoder -> merged-KV jitted greedy decode),
    min_new_tokens pinned so both decode the full budget (the reference's
    --precise_tok_per_s idea).
  * the SAME protocol is then run through the reference implementation —
    stock ``transformers.FlaxWhisperForConditionalGeneration.generate`` (the
    exact class the reference's training/flax path subclasses) — on the same
    chip.  Ours and the reference stack are timed in INTERLEAVED A/B rounds
    within one process (timing discipline of the reference's
    --precise_tok_per_s, training/run_eval.py:806-844): each round yields a
    paired ratio, cancelling chip-speed drift, and the reported spread shows
    whether the margin survives its own error bars (chip timings vary
    ~±15% run-to-run ACROSS processes, docs/PERFORMANCE.md — interleaving
    inside one process is what makes a 4-20% margin measurable).

Headline fields:
  value       = distil-large-v3 RTFx in this framework (median over rounds)
  vs_baseline = median over per-round paired ratios ours/reference-stack
                — >1.0 means faster than the reference implementation on
                identical hardware + protocol.

"extra" fields:
  vs_baseline_min / vs_baseline_max — spread of the per-round paired ratios.
  rtfx_min / rtfx_max               — spread of our per-round RTFx.
  int8_rtfx / vs_baseline_int8      — ours with the opt-in FULL int8 stack
      (W8A8 encoder + decoder projections + int8 self/cross-KV + int8
      logits matmul): the int8-MXU inference path, same protocol.
  teacher_rtfx / speedup_vs_teacher — large-v3 in this framework and the
      in-stack relative latency.  NOTE: this ratio COMPRESSES as the teacher
      gets faster — round 2's merged-KV decode cut large-v3 from 23.3 to
      9.9 ms/token (2.4x), so the in-stack ratio moved from 9.3x to ~4.4x
      while BOTH absolute numbers improved.  The published 6.3x
      (reference README.md:15) is a property of the reference stack's slow
      teacher: the reference implementation itself measures 5.85x on this
      chip (scripts/bench_hf_flax_baseline.py), and its large-v3 runs 27%
      slower than ours.
  hf_distil_rtfx — the in-run reference-stack measurement behind vs_baseline.
  rtfx_128 / ratio_128 — the short-form eval default (max_new_tokens=128).
  rtfx_eos96 / ratio_eos96 — EOS forced at generated position 96 (typical
      30 s transcript length): exercises the early-exit machinery the way
      real checkpoints do.

Weights are random bf16 (zero-egress sandbox); RTFx is protocol-determined,
not content-determined, so random weights measure exactly what real ones do.
Set BENCH_NO_HF=1 to skip the reference-stack measurement (falls back to
vs_baseline = in-stack ratio / 6.3, the round-1 semantics).
"""

import json
import os
import time

import numpy as np


def _fetch(x):
    # NB: on the tunneled 'axon' platform block_until_ready() does not wait
    # for remote execution — fetching a small output is the only reliable
    # completion barrier.
    np.asarray(x)


def _time_once(fn, iters):
    t0 = time.perf_counter()
    for _ in range(iters):
        _fetch(fn())
    return (time.perf_counter() - t0) / iters


def _build_ours(preset, batch, max_new, forced_eos_at=None, int8=False,
                int8_kv=False, int8_dec=False, int8_lm=False):
    """-> zero-arg callable running one generate; compiled+warm on return."""
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.generation import GenerationOptions, build_generate
    from distil_whisper_tpu.ops.quant import maybe_quantize_encoder

    cfg = PRESETS[preset].replace(fast_bf16_attention=True,
                                  use_flash_encoder=True,
                                  quantize_encoder=int8,
                                  quantize_decoder=int8_dec,
                                  quantize_lm_head=int8_lm,
                                  quantize_cross_kv=int8_kv,
                                  quantize_self_kv=int8_kv)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = maybe_quantize_encoder(params, cfg)
    if forced_eos_at is not None:
        # force <|endoftext|> at a fixed generated position: random weights
        # never emit EOS, this drives the early-exit path the way a real
        # checkpoint does
        opts = GenerationOptions(
            max_new_tokens=max_new,
            forced_decoder_ids=((forced_eos_at, cfg.eos_token_id),))
    else:
        # min_new_tokens pins generation to the full budget: a fixed-token
        # benchmark like the reference's --precise_tok_per_s
        opts = GenerationOptions(max_new_tokens=max_new,
                                 min_new_tokens=max_new)
    gen = build_generate(cfg, opts, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((batch, cfg.num_mel_bins, 3000)),
                      jnp.bfloat16)
    prompt = jnp.full((batch, 1), cfg.decoder_start_token_id, jnp.int32)
    key = jax.random.PRNGKey(0)

    def fn():
        return gen(params, mel, prompt, 0.0, key).seq_len

    _fetch(fn())  # compile + warmup
    return fn


def _build_hf(batch, max_new):
    """Reference stack: stock transformers FlaxWhisper distil-large-v3."""
    import jax
    import jax.numpy as jnp
    from transformers import (FlaxWhisperForConditionalGeneration,
                              WhisperConfig, GenerationConfig)

    cfg = WhisperConfig(
        vocab_size=51866, num_mel_bins=128, d_model=1280,
        encoder_attention_heads=20, decoder_attention_heads=20,
        encoder_ffn_dim=5120, decoder_ffn_dim=5120,
        max_source_positions=1500, max_target_positions=448,
        encoder_layers=32, decoder_layers=2)
    model = FlaxWhisperForConditionalGeneration(cfg, dtype=jnp.bfloat16,
                                                _do_init=True, seed=0)
    params = model.to_bf16(model.params)
    gcfg = GenerationConfig(
        max_length=1 + max_new, min_length=1 + max_new, do_sample=False,
        num_beams=1, decoder_start_token_id=cfg.decoder_start_token_id,
        bos_token_id=cfg.bos_token_id, eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id)

    @jax.jit
    def gen(params, mel):
        return model.generate(mel, params=params,
                              generation_config=gcfg).sequences

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((batch, cfg.num_mel_bins, 3000)),
                      jnp.bfloat16)

    def fn():
        return gen(params, mel)

    _fetch(fn())
    return fn


def _interleaved_rounds(fns, rounds, iters):
    """{name: fn} -> {name: [seconds per round]}, A/B/C interleaved so every
    round is a same-moment paired comparison."""
    out = {name: [] for name in fns}
    for _ in range(rounds):
        for name, fn in fns.items():
            out[name].append(_time_once(fn, iters))
    return out


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    long_budget = int(os.environ.get("BENCH_TOKENS", "256"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "5"))
    iters = int(os.environ.get("BENCH_ITERS", "2"))
    audio_s = batch * 30.0
    skip_hf = os.environ.get("BENCH_NO_HF") == "1"

    extra = {}

    # --- headline: ours vs reference stack vs int8, interleaved ---
    fns = {"ours": _build_ours("distil-large-v3", batch, long_budget)}
    try:
        # the FULL int8 stack (encoder + decoder projections + both KV
        # caches + int8 logits matmul): enc-only 948 / +dec 969 / +kv 1049
        # / +lm 1120 RTFx at bs16/256tok (scripts/ablate_distil_int8.py)
        fns["int8"] = _build_ours("distil-large-v3", batch, long_budget,
                                  int8=True, int8_kv=True, int8_dec=True,
                                  int8_lm=True)
    except Exception as e:  # noqa: BLE001
        extra["int8_error"] = str(e)[:200]
    hf_err = None
    if not skip_hf:
        try:
            fns["hf"] = _build_hf(batch, long_budget)
        except Exception as e:  # noqa: BLE001
            hf_err = str(e)[:200]

    times = _interleaved_rounds(fns, rounds, iters)
    rtfx = {k: [audio_s / t for t in v] for k, v in times.items()}
    value = float(np.median(rtfx["ours"]))
    extra["rtfx_min"] = round(min(rtfx["ours"]), 2)
    extra["rtfx_max"] = round(max(rtfx["ours"]), 2)

    if "int8" in rtfx:
        extra["int8_rtfx"] = round(float(np.median(rtfx["int8"])), 2)

    # --- teacher (in-stack ratio context; separate so peak HBM stays low) ---
    for k in list(fns):
        del fns[k]
    t_fn = _build_ours("large-v3", batch, long_budget)
    t_times = [_time_once(t_fn, 1) for _ in range(max(rounds - 2, 3))]
    teacher_rtfx = float(np.median([audio_s / t for t in t_times]))
    del t_fn
    try:
        # the full int8 teacher (encoder + decoder + self/cross KV + lm
        # head) — the PL config
        t8 = _build_ours("large-v3", batch, long_budget, int8=True,
                         int8_kv=True, int8_dec=True, int8_lm=True)
        t8_times = [_time_once(t8, 1) for _ in range(3)]
        extra["teacher_int8_rtfx"] = round(
            float(np.median([audio_s / t for t in t8_times])), 2)
        del t8
    except Exception as e:  # noqa: BLE001
        extra["teacher_int8_error"] = str(e)[:200]
    ratio = value / teacher_rtfx
    extra.update({
        "teacher_rtfx": round(teacher_rtfx, 2),
        "speedup_vs_teacher": round(ratio, 2),
        "in_stack_ratio_vs_published_6.3": round(ratio / 6.3, 3),
    })

    if "hf" in rtfx:
        pair = [o / h for o, h in zip(rtfx["ours"], rtfx["hf"])]
        vs_baseline = float(np.median(pair))
        extra.update({
            "hf_distil_rtfx": round(float(np.median(rtfx["hf"])), 2),
            "vs_baseline_min": round(min(pair), 3),
            "vs_baseline_max": round(max(pair), 3),
            "vs_baseline_kind":
                "ours/reference-stack, paired interleaved rounds, same chip",
        })
        if "int8" in rtfx:
            pair8 = [o / h for o, h in zip(rtfx["int8"], rtfx["hf"])]
            extra["vs_baseline_int8"] = round(float(np.median(pair8)), 3)
            extra["vs_baseline_int8_min"] = round(min(pair8), 3)
            extra["vs_baseline_int8_max"] = round(max(pair8), 3)
    else:
        vs_baseline = ratio / 6.3
        extra["vs_baseline_kind"] = ("in_stack_ratio/6.3 (BENCH_NO_HF)"
                                     if skip_hf else
                                     "in_stack_ratio/6.3 (HF fallback)")
        if hf_err:
            extra["hf_error"] = hf_err

    if os.environ.get("BENCH_FAST") != "1":
        def quick_pair(max_new, eos=None):
            f_d = _build_ours("distil-large-v3", batch, max_new, eos)
            d = audio_s / float(np.median([_time_once(f_d, 1)
                                           for _ in range(3)]))
            del f_d
            f_t = _build_ours("large-v3", batch, max_new, eos)
            t = audio_s / float(np.median([_time_once(f_t, 1)
                                           for _ in range(3)]))
            del f_t
            return d, t

        d128, t128 = quick_pair(128)
        d96, t96 = quick_pair(128, eos=96)
        extra.update({
            "rtfx_128": round(d128, 2), "ratio_128": round(d128 / t128, 2),
            "rtfx_eos96": round(d96, 2), "ratio_eos96": round(d96 / t96, 2),
        })

    print(json.dumps({
        "metric": "rtfx_distil_large_v3_bs%d_%dtok" % (batch, long_budget),
        "value": round(value, 2),
        "unit": "x_realtime",
        "vs_baseline": round(vs_baseline, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
