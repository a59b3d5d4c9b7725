"""Fused int8 decode-attention kernel vs the XLA dequant path, on chip.

Times the 32-layer per-token cross-attention read at teacher shape
(bs16, T=1500, D=1280, H=20) as an in-jit scan x fori loop:

  dequant  the serving path today: int8 K/V + per-head scales -> bf16
           dequant -> ops.attention.decode_attention (merged layout)
  kernel   ops.int8_decode_attention (int8 MXU both matmuls, T padded to
           1536 with masked pad rows — its production form)

Context (scripts/ablate_cross_len.py): the production decode spends
~3.28 ms/token on this stream vs a ~2.4 ms int8 HBM roofline.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_int8_decode_kernel.py
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
    from distil_whisper_tpu.ops.attention import decode_attention
    from distil_whisper_tpu.ops.int8_decode_attention import (
        int8_decode_attention)

    L = int(os.environ.get("BENCH_LAYERS", "32"))
    B = int(os.environ.get("BENCH_BATCH", "16"))
    T = int(os.environ.get("BENCH_T", "1500"))
    TP = -(-T // 128) * 128
    D = int(os.environ.get("BENCH_D", "1280"))
    H = 20
    hd = D // H
    steps = int(os.environ.get("BENCH_STEPS", "32"))
    res = {"L": L, "B": B, "T": T, "TP": TP, "D": D, "steps": steps}

    import functools

    @functools.partial(jax.jit, static_argnames=("t",))
    def build(key, t):
        x = jax.random.normal(key, (L, B, t, D), jnp.float32) * 0.1
        amax = jnp.abs(x.reshape(L, B, t, H, hd)).max(axis=(2, 4))  # [L,B,H]
        scale = jnp.maximum(amax, 1e-8) / 127.0
        sv = jnp.repeat(scale, hd, -1)[:, :, None]                  # [L,B,1,D]
        q = jnp.clip(jnp.round(x / sv), -127, 127).astype(jnp.int8)
        return q, scale

    kq, ks = build(jax.random.PRNGKey(0), T)
    vq, vs = build(jax.random.PRNGKey(1), T)
    kqp, ksp = build(jax.random.PRNGKey(0), TP)
    vqp, vsp = build(jax.random.PRNGKey(1), TP)
    for p in (kq, ks, vq, vs, kqp, ksp, vqp, vsp):
        # NB: block_until_ready() does not wait on the tunneled platform —
        # a tiny corner fetch is the only reliable completion barrier
        fetch(p[(slice(0, 1),) * p.ndim])
    print("built", flush=True)

    mask = (jnp.arange(TP) < T)[None]                               # [1, TP]
    kinds = os.environ.get("BENCH_KINDS", "dequant,kernel").split(",")
    for kind in kinds:

        if kind == "dequant":
            @jax.jit
            def loop(kq, ks, vq, vs, q0):
                def body(i, q):
                    def layer(c, xs):
                        kq_l, ks_l, vq_l, vs_l = xs
                        k = (kq_l.astype(jnp.bfloat16)
                             * jnp.repeat(ks_l, hd, -1)[:, None]
                             .astype(jnp.bfloat16))
                        v = (vq_l.astype(jnp.bfloat16)
                             * jnp.repeat(vs_l, hd, -1)[:, None]
                             .astype(jnp.bfloat16))
                        return decode_attention(c, k, v, H), None
                    q, _ = jax.lax.scan(layer, q, (kq, ks, vq, vs))
                    return q
                return jax.lax.fori_loop(0, steps, body, q0)
            args = (kq, ks, vq, vs)
        else:
            @jax.jit
            def loop(kq, ks, vq, vs, q0):
                def body(i, q):
                    def layer(c, xs):
                        kq_l, ks_l, vq_l, vs_l = xs
                        return int8_decode_attention(
                            c, kq_l, ks_l, vq_l, vs_l, H, mask=mask,
                            interpret=jax.default_backend() == "cpu"), None
                    q, _ = jax.lax.scan(layer, q, (kq, ks, vq, vs))
                    return q
                return jax.lax.fori_loop(0, steps, body, q0)
            args = (kqp, ksp, vqp, vsp)

        q0 = jax.jit(lambda k: jax.random.normal(
            k, (B, D), jnp.bfloat16) * 0.1)(jax.random.PRNGKey(2))
        try:
            t = timeit(loop, *args, q0)
            res[kind + "_ms_per_tok"] = round(t * 1e3 / steps, 3)
            print(kind, res[kind + "_ms_per_tok"], "ms/tok", flush=True)
        except Exception as e:  # noqa: BLE001
            res[kind] = f"failed: {str(e)[:300]}"
            print(kind, res[kind], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
