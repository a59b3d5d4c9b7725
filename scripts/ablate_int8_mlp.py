"""Why doesn't int8 help the encoder MLP? Isolated 32-layer MLP scan probes.

Each variant runs the MLP block scanned over 32 large-v3 layers at bs16
(>200 ms total — above the fetch-noise floor), same process for comparison:

  exact          bf16 matmuls (baseline)
  int8           dense_int8 both (current quant.py path)
  int8_fc1       fc1 int8, fc2 bf16 (cheap-side only)
  int8_bf16_epi  int8 dots but the int32->rescale epilogue in bf16
  int8_noquant   int8 dots on PRE-quantized static activations (upper bound:
                 measures pure matmul speed, no dynamic quant overhead)

Plus a trustworthy chained GEMM microbench (iteration-dependent inputs so
XLA cannot hoist the dot out of the loop).
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
    from distil_whisper_tpu.ops.quant import quantize_acts, quantize_weight

    rng = np.random.default_rng(0)
    res = {}
    B, T, D, F = 16, 1536, 1280, 5120

    # --- chained GEMM microbench: x feeds forward through 64 dots ---
    m = B * T // 4  # 6144 rows keeps it quick but chained
    xb = jnp.asarray(rng.standard_normal((m, D)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((D, D)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 128, (m, D)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 128, (D, D)), jnp.int8)

    @jax.jit
    def chain_bf16(x, w):
        def body(i, x):
            y = jax.lax.dot(x, w, preferred_element_type=jnp.float32)
            return (y * 1e-2).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, 64, body, x)[0, 0]

    @jax.jit
    def chain_int8(x, w):
        def body(i, x):
            y = jax.lax.dot(x, w, preferred_element_type=jnp.int32)
            return (y & 63).astype(jnp.int8)
        return jax.lax.fori_loop(0, 64, body, x)[0, 0]

    res["chain64_bf16"] = timeit(chain_bf16, xb, wb)
    res["chain64_int8"] = timeit(chain_int8, xi, wi)
    print("chain64 bf16", res["chain64_bf16"], "int8", res["chain64_int8"],
          flush=True)

    # --- MLP block variants, scanned over 32 layers ---
    w1 = jnp.asarray(rng.standard_normal((32, D, F)) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((32, F), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((32, F, D)) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((32, D), jnp.bfloat16)
    w1q, w1s = quantize_weight(w1)
    w2q, w2s = quantize_weight(w2)
    x0 = jnp.asarray(rng.standard_normal((B, T, D)) * 0.5, jnp.bfloat16)

    def run_scan(layer_fn):
        @jax.jit
        def f(x, *ws):
            def body(carry, lw):
                return layer_fn(carry, lw), None
            y, _ = jax.lax.scan(body, x, ws)
            return y[0, 0, :2]
        return f

    def mm_bf16(x, w, b):
        y = jnp.einsum("bti,io->bto", x, w,
                       preferred_element_type=jnp.float32)
        return y.astype(x.dtype) + b

    def mm_int8(x, wq, ws, b, epi_dtype=jnp.float32):
        xq, xs = quantize_acts(x)
        y = jnp.einsum("bti,io->bto", xq, wq,
                       preferred_element_type=jnp.int32)
        y = (y.astype(epi_dtype) * xs.astype(epi_dtype)
             * ws.astype(epi_dtype))
        return y.astype(x.dtype) + b

    def exact(x, lw):
        w1, b1, w2, b2 = lw
        h = jax.nn.gelu(mm_bf16(x, w1, b1), approximate=False)
        return x + mm_bf16(h, w2, b2)

    def int8_both(x, lw):
        w1q, w1s, b1, w2q, w2s, b2 = lw
        h = jax.nn.gelu(mm_int8(x, w1q, w1s, b1), approximate=False)
        return x + mm_int8(h, w2q, w2s, b2)

    def int8_fc1(x, lw):
        w1q, w1s, b1, w2, b2 = lw
        h = jax.nn.gelu(mm_int8(x, w1q, w1s, b1), approximate=False)
        return x + mm_bf16(h, w2, b2)

    def int8_bf16_epi(x, lw):
        w1q, w1s, b1, w2q, w2s, b2 = lw
        h = jax.nn.gelu(mm_int8(x, w1q, w1s, b1, jnp.bfloat16),
                        approximate=False)
        return x + mm_int8(h, w2q, w2s, b2, jnp.bfloat16)

    res["mlp_exact"] = timeit(run_scan(exact), x0, w1, b1, w2, b2)
    print("mlp_exact", res["mlp_exact"], flush=True)
    res["mlp_int8"] = timeit(run_scan(int8_both), x0, w1q, w1s, b1,
                             w2q, w2s, b2)
    print("mlp_int8", res["mlp_int8"], flush=True)
    res["mlp_int8_fc1"] = timeit(run_scan(int8_fc1), x0, w1q, w1s, b1, w2, b2)
    print("mlp_int8_fc1", res["mlp_int8_fc1"], flush=True)
    res["mlp_int8_bf16_epi"] = timeit(run_scan(int8_bf16_epi), x0, w1q, w1s,
                                      b1, w2q, w2s, b2)
    print("mlp_int8_bf16_epi", res["mlp_int8_bf16_epi"], flush=True)

    # upper bound: static pre-quantized activations, no dynamic quant at all
    x0q = jnp.asarray(rng.integers(-127, 128, (B, T, D)), jnp.int8)

    def int8_static(x, lw):
        w1q, b1, w2q, b2 = lw
        h = jnp.einsum("bti,io->bto", x, w1q,
                       preferred_element_type=jnp.int32)
        h = (h >> 8).astype(jnp.int8)
        y = jnp.einsum("bti,io->bto", h, w2q,
                       preferred_element_type=jnp.int32)
        return (y >> 8).astype(jnp.int8)

    res["mlp_int8_static"] = timeit(run_scan(int8_static), x0q, w1q, b1,
                                    w2q, b2)
    print("mlp_int8_static", res["mlp_int8_static"], flush=True)

    print(json.dumps({k: round(v * 1e3, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
