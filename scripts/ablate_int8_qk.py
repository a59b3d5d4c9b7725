"""Premise check for int8 QK/AV attention matmuls (round-5 candidate).

Round 3 dismissed int8 QK/AV with "head_dim 64 caps MXU utilisation
regardless" — but the K=64 contraction cap halves BOTH dtypes, and v5e
runs int8 MACs at ~2x the bf16 rate, so int8 should still ~halve the
matmul time IF the op is MAC-bound.  This times the two attention
contractions at encoder shape (B=16, H=20, T=1536, hd=64) in bf16 vs
int8(+int32 accum), in-jit repeated (sub-200 ms rule).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B, H, T, D = 16, 20, 1536, 64
    reps = 8
    rng = np.random.default_rng(0)
    q16 = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    k16 = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    q8 = jnp.asarray(rng.integers(-127, 127, (B, T, H, D)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 127, (B, T, H, D)), jnp.int8)
    p16 = jnp.asarray(rng.standard_normal((B, H, T, T)), jnp.bfloat16)
    p8 = jnp.asarray(rng.integers(0, 127, (B, H, T, T)), jnp.int8)

    @jax.jit
    def qk_bf16(q, k):
        def body(c, _):
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            return c + jnp.sum(s, axis=(2, 3)), None
        out, _ = jax.lax.scan(body, jnp.zeros((B, H), jnp.float32),
                              None, length=reps)
        return out

    @jax.jit
    def qk_int8(q, k):
        def body(c, _):
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.int32)
            return c + jnp.sum(s, axis=(2, 3)), None
        out, _ = jax.lax.scan(body, jnp.zeros((B, H), jnp.int32),
                              None, length=reps)
        return out

    @jax.jit
    def av_bf16(p, v):
        def body(c, _):
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                           preferred_element_type=jnp.float32)
            return c + jnp.sum(o, axis=(1, 3)), None
        out, _ = jax.lax.scan(body, jnp.zeros((B, H), jnp.float32),
                              None, length=reps)
        return out

    @jax.jit
    def av_int8(p, v):
        def body(c, _):
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                           preferred_element_type=jnp.int32)
            return c + jnp.sum(o, axis=(1, 3)), None
        out, _ = jax.lax.scan(body, jnp.zeros((B, H), jnp.int32),
                              None, length=reps)
        return out

    def bench(fn, *args):
        np.asarray(fn(*args))
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(fn(*args))
        return (time.perf_counter() - t0) / 3 / reps * 1e3  # ms per op

    res = {}
    for name, fn, args in [
        ("qk_bf16", qk_bf16, (q16, k16)), ("qk_int8", qk_int8, (q8, k8)),
        ("av_bf16", av_bf16, (p16, q16)), ("av_int8", av_int8, (p8, q8)),
        ("qk_bf16_2", qk_bf16, (q16, k16)), ("qk_int8_2", qk_int8, (q8, k8)),
    ]:
        res[name + "_ms"] = round(bench(fn, *args), 2)
        print(name, res[name + "_ms"], "ms", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
