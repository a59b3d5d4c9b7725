"""Decode cross-attention: can we reach the int8-KV bandwidth floor?

ablate_int4_kv.py measured the 32-layer per-token cross-attention read at
bs16: bf16 8.57 ms, int8-dequant 6.98 ms — but the pure int8 K/V byte
traffic is only ~4.8 ms at HBM roofline, so ~2 ms of the int8 path is the
dequantized-operand materialisation XLA fails to fuse.  (int4 is dead:
s4 unsupported by this backend, manual nibble unpack 21 ms.)

Variants, same shapes (L=32, B=16, T=1500, D=1280), one process so the
numbers pair:

  floor     pure-read floor: per layer, integer-sum K and V int8 buffers
  dequant   the serving path today: K/V int8 -> bf16 * scale, bf16 einsums
  qk8       K stays int8 through QK^T (q dynamically quantized per (B,H)
            row, int8 x int8 -> int32 MXU dot, fp32 rescale); V dequant
  qkv8      + AV in int8 too (probs quantized per (B,H) row)

Scales are per (batch, head) for K/V (the serving cross-KV scheme —
per-channel K scales cannot factor out of the QK contraction).
PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_decode_attn2.py
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

    L = int(os.environ.get("BENCH_LAYERS", "32"))
    B = int(os.environ.get("BENCH_BATCH", "16"))
    T = int(os.environ.get("BENCH_T", "1500"))
    D = int(os.environ.get("BENCH_D", "1280"))
    H = 20
    hd = D // H
    steps = int(os.environ.get("BENCH_STEPS", "32"))
    res = {"L": L, "B": B, "T": T, "D": D, "steps": steps}

    @jax.jit
    def build(key):
        """int8 K/V [L,B,T,D] + per-(L,B,H) fp32 scale, built on device."""
        x = jax.random.normal(key, (L, B, T, D), jnp.float32) * 0.1
        xh = x.reshape(L, B, T, H, hd)
        amax = jnp.abs(xh).max(axis=(2, 4))            # [L,B,H]
        scale = jnp.maximum(amax, 1e-8) / 127.0
        sv = jnp.repeat(scale, hd, axis=-1)[:, :, None]  # [L,B,1,D]
        q = jnp.clip(jnp.round(x / sv), -127, 127).astype(jnp.int8)
        return q, scale

    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    kq, ks = build(k0)
    vq, vs = build(k1)
    for p in (kq, ks, vq, vs):
        # block_until_ready() does not wait on the tunneled platform
        fetch(p[(slice(0, 1),) * p.ndim])
    print("built", flush=True)

    def attend(kind, q, layer):
        kq_l, ks_l, vq_l, vs_l = layer                 # [B,T,D], [B,H], ...
        qh = q.reshape(B, H, hd)
        if kind == "dequant":
            k = (kq_l.astype(jnp.bfloat16)
                 * jnp.repeat(ks_l, hd, -1)[:, None].astype(jnp.bfloat16))
            s = jnp.einsum("bhd,bthd->bht", qh, k.reshape(B, T, H, hd))
        else:
            # quantize q per (B, H) row; int8 x int8 -> int32 on the MXU
            q32 = qh.astype(jnp.float32)
            qa = jnp.maximum(jnp.abs(q32).max(-1), 1e-8) / 127.0   # [B,H]
            q8 = jnp.clip(jnp.round(q32 / qa[..., None]), -127,
                          127).astype(jnp.int8)
            s32 = jnp.einsum("bhd,bthd->bht", q8,
                             kq_l.reshape(B, T, H, hd),
                             preferred_element_type=jnp.int32)
            s = (s32.astype(jnp.float32)
                 * (qa * ks_l)[:, :, None]).astype(jnp.bfloat16)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        if kind == "qkv8":
            # probs in [0,1]: per-(B,H) row absmax int8
            pa = jnp.maximum(p.max(-1), 1e-8) / 127.0              # [B,H]
            p8 = jnp.clip(jnp.round(p / pa[..., None]), 0,
                          127).astype(jnp.int8)
            o32 = jnp.einsum("bht,bthd->bhd", p8,
                             vq_l.reshape(B, T, H, hd),
                             preferred_element_type=jnp.int32)
            o = o32.astype(jnp.float32) * (pa * vs_l)[..., None]
            return o.astype(jnp.bfloat16).reshape(B, D)
        v = (vq_l.astype(jnp.bfloat16)
             * jnp.repeat(vs_l, hd, -1)[:, None].astype(jnp.bfloat16))
        o = jnp.einsum("bht,bthd->bhd", p.astype(jnp.bfloat16),
                       v.reshape(B, T, H, hd))
        return o.reshape(B, D)

    kinds = os.environ.get("BENCH_KINDS", "floor,dequant,qk8,qkv8").split(",")
    for kind in kinds:

        @jax.jit
        def loop(kq, ks, vq, vs, q0):
            if kind == "floor":
                def body(i, acc):
                    def layer(c, xs):
                        a, b = xs
                        return c + jnp.sum(a, dtype=jnp.int32) \
                                 + jnp.sum(b, dtype=jnp.int32), None
                    c, _ = jax.lax.scan(layer, acc + i, (kq, vq))
                    return c
                return jax.lax.fori_loop(0, steps, body, jnp.int32(0))

            def body(i, q):
                def layer(c, xs):
                    return attend(kind, c, xs), None
                q, _ = jax.lax.scan(layer, q, (kq, ks, vq, vs))
                return q
            return jax.lax.fori_loop(0, steps, body, q0)

        q0 = jax.jit(lambda k: jax.random.normal(
            k, (B, D), jnp.bfloat16) * 0.1)(jax.random.PRNGKey(2))
        try:
            t = timeit(loop, kq, ks, vq, vs, q0)
            res[kind + "_ms_per_tok"] = round(t * 1e3 / steps, 3)
            print(kind, res[kind + "_ms_per_tok"], "ms/tok", flush=True)
        except Exception as e:  # noqa: BLE001
            res[kind] = f"failed: {str(e)[:160]}"
            print(kind, res[kind], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
