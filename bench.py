"""Benchmark: batched transcription RTFx, distil-large-v3 vs whisper-large-v3.

Protocol. The reference's published headline (6.3x relative latency,
README.md:15) is measured on LONG-FORM transcription, where each 30 s window
decodes to (close to) the full token budget — the reference's own
pseudo-labelling and sequential-eval settings use max_new_tokens=256 /
segment budgets of 224 (training/run_pseudo_labelling.py gen_kwargs,
README.md:266-275).  The headline metric therefore times the end-to-end
generate path (mel -> flash encoder -> jitted greedy decode) at batch 16 with
a 256-token budget, the worst case for RTFx (real checkpoints stop at EOS
sooner).  Also reported in "extra":

  * rtfx_128 / ratio_128 — the short-form eval default (max_new_tokens=128,
    README.md:311-332), the round-1 protocol.
  * rtfx_eos96 / ratio_eos96 — an EOS-stop variant: <|endoftext|> is forced
    at generated position 96 (a typical 30 s transcript length), so the
    while-loop's early-exit machinery runs exactly as with real checkpoints.

Both models run the identical program (same generate fn, same budgets).
Weights are random bf16 (zero-egress sandbox).

Prints ONE JSON line:
  value       = distil-large-v3 RTFx at the headline setting
  vs_baseline = (distil RTFx / teacher RTFx) / 6.3
"""

import json
import os
import time

import numpy as np


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

        # NB: on the tunneled 'axon' platform block_until_ready() does not
        # wait for remote execution — fetching a small output is the only
        # reliable completion barrier.
        res = fn(params, mel, prompt, 0.0, key)       # compile + warmup
        np.asarray(res.seq_len)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            res = fn(params, mel, prompt, 0.0, key)
            np.asarray(res.seq_len)
        dt = (time.perf_counter() - t0) / n_iters
        out[preset] = batch * 30.0 / dt
        del params
    return out


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    long_budget = int(os.environ.get("BENCH_TOKENS", "256"))

    headline = _bench_pair(batch, long_budget)
    ratio = headline["distil-large-v3"] / headline["large-v3"]

    extra = {
        "teacher_rtfx": round(headline["large-v3"], 2),
        "speedup_vs_teacher": round(ratio, 2),
    }
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
        "value": round(headline["distil-large-v3"], 2),
        "unit": "x_realtime",
        "vs_baseline": round(ratio / 6.3, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
