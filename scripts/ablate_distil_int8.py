"""Same-process A/B: distil-large-v3 bs16/256tok generate with the int8
encoder only (the current bench.py int8 lane) vs the FULL int8 stack
(encoder + decoder projections + self/cross-KV).

The decoder side of distil is shallow (2 layers) but every token still
streams the [51865, 1280] tied-embedding logits matmul in bf16 plus the
projection weights; this measures whether quantizing the projections/KV
moves the bs16 number or is noise.  BENCH_BATCH / BENCH_TOKENS override.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.generation import GenerationOptions, build_generate
    from distil_whisper_tpu.ops.quant import maybe_quantize_encoder

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    max_new = int(os.environ.get("BENCH_TOKENS", "256"))

    def build(enc8, dec8, kv8, lm8=False):
        cfg = PRESETS["distil-large-v3"].replace(
            fast_bf16_attention=True, use_flash_encoder=True,
            quantize_encoder=enc8, quantize_decoder=dec8,
            quantize_cross_kv=kv8, quantize_self_kv=kv8,
            quantize_lm_head=lm8)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        params = maybe_quantize_encoder(params, cfg)
        opts = GenerationOptions(max_new_tokens=max_new,
                                 min_new_tokens=max_new)
        gen = build_generate(cfg, opts, dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.standard_normal(
            (batch, cfg.num_mel_bins, 3000)), jnp.bfloat16)
        prompt = jnp.full((batch, 1), cfg.decoder_start_token_id, jnp.int32)
        key = jax.random.PRNGKey(0)

        def fn():
            return gen(params, mel, prompt, 0.0, key).seq_len
        np.asarray(fn())  # compile + warm
        return fn

    variants = {
        "enc8": build(True, False, False),
        "enc8_dec8_kv8": build(True, True, True),
        "enc8_dec8_kv8_lm8": build(True, True, True, True),
    }
    # interleaved rounds: each round times every variant once
    times = {k: [] for k in variants}
    for _ in range(5):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            np.asarray(fn())
            times[k].append(time.perf_counter() - t0)
    res = {"batch": batch, "tokens": max_new}
    for k, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        res[k + "_ms"] = round(med * 1e3, 1)
        res[k + "_rtfx"] = round(batch * 30.0 / med, 1)
        print(k, res[k + "_ms"], "ms", res[k + "_rtfx"], "RTFx", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
