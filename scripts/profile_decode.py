"""On-chip profiling of the generate path: where does the time go?

Times, for distil-large-v3 and large-v3 (random bf16 weights, bs from env):
  * encode + cross_kv alone
  * full generate at max_new in {1, 16, 64, 128}  -> per-token slope/intercept

Run on the real chip:  python scripts/profile_decode.py
"""

import json
import os
import time

import numpy as np


def fetch(x):
    np.asarray(x)  # only reliable completion barrier on the axon platform


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.models.whisper import encode, cross_kv
    from distil_whisper_tpu.generation import GenerationOptions, build_generate

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    results = {}
    for preset in ("distil-large-v3", "large-v3"):
        cfg = PRESETS[preset].replace(fast_bf16_attention=True)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.standard_normal((batch, cfg.num_mel_bins, 3000)),
                          jnp.bfloat16)
        prompt = jnp.full((batch, 1), cfg.decoder_start_token_id, jnp.int32)
        key = jax.random.PRNGKey(0)

        @jax.jit
        def enc_fn(params, mel):
            e = encode(params["encoder"], cfg, mel, dtype=jnp.bfloat16)
            c = cross_kv(params["decoder"], cfg, e)
            return c["k"][0, 0, 0, :1]

        out = enc_fn(params, mel); fetch(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = enc_fn(params, mel); fetch(out)
        t_enc = (time.perf_counter() - t0) / 5
        results[f"{preset}/encode+crosskv"] = round(t_enc * 1e3, 2)
        print(f"{preset}: encode+cross_kv {t_enc*1e3:.1f} ms", flush=True)

        for max_new in (1, 16, 64, 128):
            opts = GenerationOptions(max_new_tokens=max_new,
                                     min_new_tokens=max_new,
                                     return_timestamps=False)
            fn = build_generate(cfg, opts, dtype=jnp.bfloat16)
            out = fn(params, mel, prompt, 0.0, key); fetch(out.seq_len)
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(params, mel, prompt, 0.0, key); fetch(out.seq_len)
            dt = (time.perf_counter() - t0) / 3
            results[f"{preset}/gen{max_new}"] = round(dt * 1e3, 2)
            print(f"{preset}: generate({max_new}) {dt*1e3:.1f} ms", flush=True)

        t1, t128 = results[f"{preset}/gen1"], results[f"{preset}/gen128"]
        slope = (t128 - t1) / 127.0
        results[f"{preset}/ms_per_token"] = round(slope, 3)
        print(f"{preset}: {slope:.3f} ms/token, intercept {t1:.1f} ms",
              flush=True)
        del params

    print(json.dumps(results))


if __name__ == "__main__":
    main()
