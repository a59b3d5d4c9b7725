"""Benchmark: short-form batched transcription RTFx, distil vs teacher.

Measures the framework's end-to-end generate path (mel -> encoder -> jitted
greedy decode, 128 new tokens, batch 8 of 30 s windows — the reference eval
defaults, BASELINE.md) on the available accelerator for the
distil-large-v3-sized student and the whisper-large-v3-sized teacher (random
weights; generation always runs the full token budget, which is the
worst case for RTFx — real checkpoints stop at EOS sooner).

Prints ONE JSON line:
  value       = distil-large-v3 RTFx (audio-seconds per wall-second)
  vs_baseline = (distil RTFx / teacher RTFx) / 6.3   -- the reference's
                published relative-latency headline (README.md:15).
"""

import json
import os
import time

import numpy as np


def _rtfx(preset: str, batch: int, max_new: int, n_iters: int = 3) -> float:
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.generation import GenerationOptions, build_generate

    cfg = PRESETS[preset].replace(fast_bf16_attention=True, use_flash_encoder=True)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    # min_new_tokens pins generation to the full budget: a fixed-token
    # benchmark like the reference's --precise_tok_per_s (run_eval.py:806-844)
    opts = GenerationOptions(max_new_tokens=max_new, min_new_tokens=max_new,
                             return_timestamps=False)
    fn = build_generate(cfg, opts, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((batch, cfg.num_mel_bins, 3000)),
                      jnp.bfloat16)
    prompt = jnp.full((batch, 1), cfg.decoder_start_token_id, jnp.int32)
    key = jax.random.PRNGKey(0)

    # NB: on the tunneled 'axon' platform block_until_ready() does not wait
    # for remote execution — fetching a small output is the only reliable
    # completion barrier (~50 ms relay round-trip, amortised below).
    out = fn(params, mel, prompt, 0.0, key)       # compile + warmup
    np.asarray(out.seq_len)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(params, mel, prompt, 0.0, key)
        np.asarray(out.seq_len)
    dt = (time.perf_counter() - t0) / n_iters
    audio_seconds = batch * 30.0
    del params
    return audio_seconds / dt


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))  # reference eval default
    max_new = int(os.environ.get("BENCH_TOKENS", "128"))

    distil_rtfx = _rtfx("distil-large-v3", batch, max_new)
    teacher_rtfx = _rtfx("large-v3", batch, max_new)
    speedup = distil_rtfx / teacher_rtfx

    print(json.dumps({
        "metric": "rtfx_distil_large_v3_bs%d_%dtok" % (batch, max_new),
        "value": round(distil_rtfx, 2),
        "unit": "x_realtime",
        "vs_baseline": round(speedup / 6.3, 3),
        "extra": {"teacher_rtfx": round(teacher_rtfx, 2),
                  "speedup_vs_teacher": round(speedup, 2)},
    }))


if __name__ == "__main__":
    main()
