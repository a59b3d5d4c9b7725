"""int8 MXU ablation on-chip: is W8A8 worth it, and where.

1. matmul microbench: bf16 vs int8 dot at encoder GEMM shapes, in-jit loop
   (any per-call number <200 ms is fetch noise — docs/PERFORMANCE.md).
2. full encode(): exact bf16 vs quantize_encoder_params (large-v3, bs16,
   flash encoder + fast bf16 attention = the bench.py inference config).
3. decode step cost with int8 encoder (should be unchanged — sanity).
"""

import json
import time

import numpy as np


def fetch(x):
    np.asarray(x)


def timeit(fn, *a, iters=5):
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
    from distil_whisper_tpu.models.whisper import encode
    from distil_whisper_tpu.ops.quant import (quantize_encoder_params,
                                              quantize_acts)

    res = {}
    rng = np.random.default_rng(0)

    # --- 1. matmul microbench: in-jit chained loop, slope-style ---
    m, k = 16 * 1536, 1280
    for n, label in ((1280, "gemm_1280"), (5120, "gemm_5120")):
        xb = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)

        @jax.jit
        def loop_bf16(x, w, it=20):
            def body(i, acc):
                y = jax.lax.dot(x, w, preferred_element_type=jnp.float32)
                return acc + y[0, 0]
            return jax.lax.fori_loop(0, it, body, 0.0)

        @jax.jit
        def loop_int8(x, w, it=20):
            def body(i, acc):
                y = jax.lax.dot(x, w, preferred_element_type=jnp.int32)
                return acc + y[0, 0]
            return jax.lax.fori_loop(0, it, body, jnp.int32(0))

        # NOTE: loop body has no iteration-dependence on inputs; XLA may
        # hoist — compare via per-iter slope between it=20 and it=120 runs
        t_bf = timeit(lambda: loop_bf16(xb, wb))
        t_i8 = timeit(lambda: loop_int8(xi, wi))
        res[f"{label}_bf16_20it"] = t_bf
        res[f"{label}_int8_20it"] = t_i8
        print(label, "bf16", t_bf, "int8", t_i8, flush=True)

    # --- 2. full encoder, exact vs int8 ---
    cfg = PRESETS["large-v3"].replace(fast_bf16_attention=True,
                                      use_flash_encoder=True)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    mel = jnp.asarray(rng.standard_normal((16, cfg.num_mel_bins, 3000)),
                      jnp.bfloat16)

    enc_exact = jax.jit(lambda p, m: encode(p, cfg, m, dtype=jnp.bfloat16
                                            )[:, :2, :2])
    res["encode_bf16"] = timeit(enc_exact, params["encoder"], mel)
    print("encode_bf16", res["encode_bf16"], flush=True)

    qenc = jax.jit(quantize_encoder_params)(params["encoder"])
    jax.tree.map(lambda x: x.block_until_ready(), qenc)
    res["encode_int8"] = timeit(enc_exact, qenc, mel)
    print("encode_int8", res["encode_int8"], flush=True)

    # variant: int8 MLP only (attention projections exact) — in case the
    # bhtk int8 layout defeats Mosaic
    mlp_only = dict(params["encoder"])
    L = dict(params["encoder"]["layers"])
    qL = qenc["layers"]
    L["fc1"], L["fc2"] = qL["fc1"], qL["fc2"]
    mlp_only["layers"] = L
    res["encode_int8_mlp_only"] = timeit(enc_exact, mlp_only, mel)
    print("encode_int8_mlp_only", res["encode_int8_mlp_only"], flush=True)

    # --- 3. quantize_acts overhead at encoder activation shape ---
    x = jnp.asarray(rng.standard_normal((16, 1536, 1280)), jnp.bfloat16)

    @jax.jit
    def qa_loop(x, it=20):
        def body(i, acc):
            q, s = quantize_acts(x + acc)
            return acc + s[0, 0, 0]
        return jax.lax.fori_loop(0, it, body, jnp.float32(0.0))

    res["quantize_acts_20it"] = timeit(lambda: qa_loop(x))
    print("quantize_acts_20it", res["quantize_acts_20it"], flush=True)

    print(json.dumps({k: round(v * 1e3, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
