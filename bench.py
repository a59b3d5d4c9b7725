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
    chip, giving the absolute baseline a user switches from.

Headline fields:
  value       = distil-large-v3 RTFx in this framework
  vs_baseline = value / (distil-large-v3 RTFx on the reference stack,
                measured in this same run)  — >1.0 means faster than the
                reference implementation on identical hardware + protocol.

"extra" fields:
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


def _bench_pair(batch, max_new, forced_eos_at=None, n_iters=3):
    """Returns {preset: rtfx} for distil-large-v3 + large-v3."""
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.generation import GenerationOptions, build_generate

    out = {}
    for preset in ("distil-large-v3", "large-v3"):
        cfg = PRESETS[preset].replace(fast_bf16_attention=True,
                                      use_flash_encoder=True)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        if forced_eos_at is not None:
            # force <|endoftext|> at a fixed generated position: random
            # weights never emit EOS, this drives the early-exit path the
            # way a real checkpoint does
            opts = GenerationOptions(
                max_new_tokens=max_new,
                forced_decoder_ids=((forced_eos_at, cfg.eos_token_id),))
        else:
            # min_new_tokens pins generation to the full budget: a fixed-
            # token benchmark like the reference's --precise_tok_per_s
            opts = GenerationOptions(max_new_tokens=max_new,
                                     min_new_tokens=max_new)
        fn = build_generate(cfg, opts, dtype=jnp.bfloat16)

        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.standard_normal((batch, cfg.num_mel_bins, 3000)),
                          jnp.bfloat16)
        prompt = jnp.full((batch, 1), cfg.decoder_start_token_id, jnp.int32)
        key = jax.random.PRNGKey(0)

        res = fn(params, mel, prompt, 0.0, key)       # compile + warmup
        _fetch(res.seq_len)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            res = fn(params, mel, prompt, 0.0, key)
            _fetch(res.seq_len)
        dt = (time.perf_counter() - t0) / n_iters
        out[preset] = batch * 30.0 / dt
        del params
    return out


def _bench_hf_flax_distil(batch, max_new, n_iters=3):
    """distil-large-v3 RTFx through the stock transformers FlaxWhisper stack
    (the reference implementation) on the same chip, same protocol."""
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
    out = gen(params, mel); _fetch(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = gen(params, mel); _fetch(out)
    dt = (time.perf_counter() - t0) / n_iters
    return batch * 30.0 / dt


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    long_budget = int(os.environ.get("BENCH_TOKENS", "256"))

    headline = _bench_pair(batch, long_budget)
    ratio = headline["distil-large-v3"] / headline["large-v3"]
    value = headline["distil-large-v3"]

    extra = {
        "teacher_rtfx": round(headline["large-v3"], 2),
        "speedup_vs_teacher": round(ratio, 2),
        "in_stack_ratio_vs_published_6.3": round(ratio / 6.3, 3),
    }

    if os.environ.get("BENCH_NO_HF") == "1":
        vs_baseline = ratio / 6.3
        extra["vs_baseline_kind"] = "in_stack_ratio/6.3 (BENCH_NO_HF)"
    else:
        try:
            hf = _bench_hf_flax_distil(batch, long_budget)
            extra["hf_distil_rtfx"] = round(hf, 2)
            extra["vs_baseline_kind"] = "ours/reference-stack, same chip"
            vs_baseline = value / hf
        except Exception as e:  # noqa: BLE001
            extra["hf_error"] = str(e)[:200]
            extra["vs_baseline_kind"] = "in_stack_ratio/6.3 (HF fallback)"
            vs_baseline = ratio / 6.3

    if os.environ.get("BENCH_FAST") != "1":
        short = _bench_pair(batch, 128)
        eos = _bench_pair(batch, 128, forced_eos_at=96)
        extra.update({
            "rtfx_128": round(short["distil-large-v3"], 2),
            "ratio_128": round(short["distil-large-v3"] / short["large-v3"], 2),
            "rtfx_eos96": round(eos["distil-large-v3"], 2),
            "ratio_eos96": round(eos["distil-large-v3"] / eos["large-v3"], 2),
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
