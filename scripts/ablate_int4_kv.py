"""Cross-KV storage-format probe: is int4 KV a real HBM win on this chip?

The teacher's (large-v3) cached decode re-reads the whole cross-attention
K/V every token: 32 layers x 2 x [B, 1500, 1280] — ~2 GB int8 at bs16,
the single largest HBM stream of the decode step (docs/PERFORMANCE.md).
int8 halved it vs bf16 (measured, ablate_int8_selfkv.py); int4 would halve
it again IF the dequant stays fused into the attention operand load (the
risk: XLA materialises the unpacked tensor and the win evaporates).

This probe times JUST the per-token cross-attention read+compute over a
32-layer scan x in-jit token loop, with four K/V storages:

  bf16          [L,B,T,D] bf16
  int8          [L,B,T,D] int8  + [L,B,1,D] fp32 scale (the serving layout)
  int4_native   [L,B,T,D] jnp.int4 + scale   (XLA s4: packed 2/byte in HBM?)
  int4_packed   [L,B,T,D/2] int8, two nibbles/byte + scale (manual packing)

Values are garbage (bandwidth probe, not numerics); per-variant ms/token is
the comparison.  PYTHONPATH=/root/repo:/root/.axon_site python ...
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
    H, hd = 20, D // 20
    steps = int(os.environ.get("BENCH_STEPS", "32"))
    rng = np.random.default_rng(0)
    res = {"L": L, "B": B, "T": T, "D": D, "steps": steps}

    def make_kv(kind):
        """-> (k_parts, v_parts) stacked [L, ...], built ON DEVICE (host->
        device transfer of multi-GB buffers rides a slow tunnel here)."""
        @jax.jit
        def build(key):
            x = jax.random.normal(key, (L, B, T, D), jnp.float32) * 0.1
            scale = jnp.abs(x).max(axis=2, keepdims=True) / 7.0  # [L,B,1,D]
            if kind == "bf16":
                return (x.astype(jnp.bfloat16),)
            if kind == "int8":
                q = jnp.clip(jnp.round(x / scale * 16), -127, 127)
                return (q.astype(jnp.int8), scale)
            q = jnp.clip(jnp.round(x / scale), -7, 7)
            if kind == "int4_native":
                return (q.astype(jnp.int4), scale)
            # int4_packed: nibble-pair channels (2c, 2c+1) -> one int8
            qi = q.astype(jnp.int8)
            lo = jnp.bitwise_and(qi[..., 0::2], 0xF)
            hi = jnp.bitwise_and(qi[..., 1::2], 0xF)
            packed = jnp.bitwise_or(lo, jnp.left_shift(hi, 4))  # [L,B,T,D/2]
            return (packed, scale)
        k0, k1 = jax.random.split(jax.random.PRNGKey(0))
        return build(k0), build(k1)

    def read_kv(parts, kind, dtype):
        """Per-layer parts -> [B, T, D] dequantized."""
        if kind == "bf16":
            return parts[0]
        if kind in ("int8", "int4_native"):
            return parts[0].astype(dtype) * parts[1].astype(dtype)
        packed, scale = parts
        lo = jnp.left_shift(packed, 4)
        lo = jnp.right_shift(lo, 4)                     # sign-extended low
        hi = jnp.right_shift(packed, 4)                 # arithmetic high
        x = jnp.stack([lo, hi], axis=-1).reshape(packed.shape[:-1] + (D,))
        return x.astype(dtype) * scale.astype(dtype)

    kinds = os.environ.get(
        "BENCH_KINDS", "bf16,int8,int4_native,int4_packed").split(",")
    for kind in kinds:
        try:
            print(kind, "building...", flush=True)
            k_parts, v_parts = make_kv(kind)
            for p in k_parts + v_parts:
                # block_until_ready() does not wait on the tunneled platform
                fetch(p[(slice(0, 1),) * p.ndim])
            print(kind, "built; compiling+running...", flush=True)
        except Exception as e:  # noqa: BLE001
            res[kind] = f"build failed: {str(e)[:120]}"
            print(kind, res[kind], flush=True)
            continue

        @jax.jit
        def loop(k_parts, v_parts, q0):
            def body(i, q):
                def layer(carry, parts):
                    kp = parts[:len(k_parts)]
                    vp = parts[len(k_parts):]
                    k = read_kv(kp, kind, jnp.bfloat16)
                    v = read_kv(vp, kind, jnp.bfloat16)
                    qh = carry.reshape(B, H, hd)
                    kh = k.reshape(B, T, H, hd)
                    vh = v.reshape(B, T, H, hd)
                    s = jnp.einsum("bhd,bthd->bht", qh, kh)
                    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
                    o = jnp.einsum("bht,bthd->bhd", p.astype(jnp.bfloat16),
                                   vh)
                    return o.reshape(B, D), None
                q, _ = jax.lax.scan(layer, q, k_parts + v_parts)
                return q
            return jax.lax.fori_loop(0, steps, body, q0)

        q0 = jnp.asarray(rng.standard_normal((B, D)) * 0.1, jnp.bfloat16)
        try:
            t = timeit(loop, k_parts, v_parts, q0)
            res[kind + "_ms_per_tok"] = round(t * 1e3 / steps, 3)
            print(kind, res[kind + "_ms_per_tok"], "ms/tok", flush=True)
        except Exception as e:  # noqa: BLE001
            res[kind] = f"run failed: {str(e)[:160]}"
            print(kind, res[kind], flush=True)
        del k_parts, v_parts

    print(json.dumps(res))


if __name__ == "__main__":
    main()
