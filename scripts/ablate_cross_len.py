"""Attribution by slope: what does the REAL int8 teacher decode spend on
reading the cross-attention K/V?

Runs the production cached-decode step (full int8 stack: decoder
projections + self/cross-KV) with the encoder sequence truncated to
{375, 750, 1500} positions.  The cross-KV byte traffic is linear in T_enc,
everything else is constant, so the slope x 1500 is the true per-token cost
of the cross-KV stream in the real program — compare it against the HBM
roofline (~2.4 ms at bs16 int8) to see if a fused kernel has anything left
to win.  (Probe-level estimates overstate it: a head-split reshape
materialises the dequantized cache; the production merged-layout path never
reshapes K/V — ops/attention.py::decode_attention.)

PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_cross_len.py
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
    from distil_whisper_tpu.ops.quant import quantize_decoder_params

    B = int(os.environ.get("BENCH_BATCH", "16"))
    steps = int(os.environ.get("BENCH_STEPS", "64"))
    cfg = PRESETS["large-v3"].replace(fast_bf16_attention=True,
                                     quantize_self_kv=True,
                                     quantize_cross_kv=True,
                                     quantize_decoder=True)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    dec = quantize_decoder_params(params["decoder"])
    res = {"batch": B, "steps": steps}

    for t_enc in (375, 750, 1500):
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

        enc = jax.jit(lambda k: jax.random.normal(
            k, (B, t_enc, cfg.d_model), jnp.bfloat16) * 0.1)(
                jax.random.PRNGKey(1))
        t = timeit(loop, dec, enc)
        res[f"tenc{t_enc}_ms_per_tok"] = round(t * 1e3 / steps, 3)
        print(t_enc, res[f"tenc{t_enc}_ms_per_tok"], "ms/tok", flush=True)

    a = res.get("tenc375_ms_per_tok")
    c = res.get("tenc1500_ms_per_tok")
    if a and c:
        # cost attributable to the 1500-pos cross stream (slope x 1500)
        res["cross_stream_ms"] = round((c - a) * 1500 / 1125, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
