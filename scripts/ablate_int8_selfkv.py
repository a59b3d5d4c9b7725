"""Teacher (large-v3) per-token decode cost: int8 self-KV cache ablation.

Measures the full cached-decode step (merged-KV carry scan) at bs16 over a
long in-jit token loop (amortises the fetch floor), with the 4 storage
combos: {bf16, int8} self-cache x {bf16, int8} cross-KV.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_int8_selfkv.py
"""

import json
import os
import time

import numpy as np


def fetch(x):
    np.asarray(x)


def timeit(fn, *a, iters=3):
    out = fn(*a); fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a); fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.models.whisper import decode, init_cache, cross_kv

    B = int(os.environ.get("BENCH_BATCH", "16"))
    steps = int(os.environ.get("BENCH_STEPS", "64"))
    cfg0 = PRESETS["large-v3"].replace(fast_bf16_attention=True)
    params = init_params(cfg0, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((B, 1500, cfg0.d_model)) * 0.1,
                      jnp.bfloat16)
    res = {"batch": B, "steps": steps}

    for self_q in (False, True):
        for cross_q in (False, True):
            cfg = cfg0.replace(quantize_self_kv=self_q,
                               quantize_cross_kv=cross_q)

            @jax.jit
            def loop(dec_params, enc):
                cross = cross_kv(dec_params, cfg, enc)
                cache = init_cache(cfg, B, dtype=jnp.bfloat16, max_len=448)
                tok = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)

                def body(carry, i):
                    tok, cache = carry
                    lg, cache = decode(dec_params, cfg, tok, cross=cross,
                                       cache=cache, pos_offset=i,
                                       dtype=jnp.bfloat16)
                    nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
                    return (nxt, cache), None

                (tok, _), _ = jax.lax.scan(body, (tok, cache),
                                           jnp.arange(steps))
                return tok

            name = f"self_{'i8' if self_q else 'bf16'}" \
                   f"_cross_{'i8' if cross_q else 'bf16'}"
            t = timeit(loop, params["decoder"], enc)
            # subtract nothing: report total & per-token (encoder/cross prep
            # amortised over the in-jit steps is part of the measurement;
            # compare variants, not absolutes)
            res[name + "_ms_per_tok"] = round(t * 1e3 / steps, 3)
            print(name, res[name + "_ms_per_tok"], "ms/tok", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
