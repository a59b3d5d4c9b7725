"""Same-process A/B: the speculative verify window's self+cross attention
(S=gamma+1 queries against merged-layout K/V) via decode_attention_multi vs
the head-split bf16 einsum (mha) it replaced.

Teacher-verify shape: B=1, T=454-slot cache, D=1280 (H=20), S=6, stacked to
the 32-layer depth via lax.scan with in-jit repetition (any sub-200 ms
per-call number is fetch noise — docs/PERFORMANCE.md rule 2).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.ops.attention import (mha, decode_attention_multi,
                                                  causal_mask)

    B, T, H, HD, S, L = 1, 454, 20, 64, 6, 32
    D = H * HD
    reps = 20
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((L, B, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((L, B, T, D)), jnp.bfloat16)
    cm = causal_mask(S, T, 17)
    cm_multi = jnp.swapaxes(cm[:, 0], 1, 2)

    @jax.jit
    def run_multi(q, k, v):
        def rep(x, _):
            def body(x, kv):
                kl, vl = kv
                y = decode_attention_multi(x, kl, vl, H, cm_multi)
                return y / (1.0 + jnp.max(jnp.abs(y))), None
            x, _ = jax.lax.scan(body, x, (k, v))
            return x, None
        x, _ = jax.lax.scan(rep, q, None, length=reps)
        return x

    @jax.jit
    def run_split(q, k, v):
        def rep(x, _):
            def body(x, kv):
                kl, vl = kv
                y = mha(x.reshape(B, S, H, HD),
                        kl.reshape(B, T, H, HD), vl.reshape(B, T, H, HD),
                        cm, float32_logits=False).reshape(B, S, D)
                return y / (1.0 + jnp.max(jnp.abs(y))), None
            x, _ = jax.lax.scan(body, x, (k, v))
            return x, None
        x, _ = jax.lax.scan(rep, q, None, length=reps)
        return x

    def bench(fn):
        np.asarray(fn(q, k, v))
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(fn(q, k, v))
        return (time.perf_counter() - t0) / 3 / reps / L * 1e6  # us/layer

    eye = jnp.eye(H, dtype=jnp.bfloat16)

    def multi_mm(x, kl, vl):
        """Variant: probs^T @ v as a second MXU matmul over the merged
        layout (computes an H-redundant [SH, D] block) + tiny diagonal
        extract, instead of the S-times elementwise expand."""
        scale = jnp.asarray(HD ** -0.5, x.dtype)
        qblk = ((x * scale).reshape(B, S, H, HD, 1) * eye[:, None, :])
        qblk = qblk.transpose(0, 2, 3, 1, 4).reshape(B, D, S * H)
        logits = jax.lax.dot_general(kl, qblk, (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
        logits = jnp.where(jnp.repeat(cm_multi, H, axis=-1), logits, -1e9)
        probs = jax.nn.softmax(logits, axis=1).astype(x.dtype)  # [B,T,SH]
        full = jax.lax.dot_general(probs, vl, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)
        full = full.reshape(B, S, H, H, HD)
        out = jnp.einsum("bshgj,hg->bshj", full.astype(x.dtype), eye)
        return out.reshape(B, S, D)

    @jax.jit
    def run_mm(q, k, v):
        def rep(x, _):
            def body(x, kv):
                kl, vl = kv
                y = multi_mm(x, kl, vl)
                return y / (1.0 + jnp.max(jnp.abs(y))), None
            x, _ = jax.lax.scan(body, x, (k, v))
            return x, None
        x, _ = jax.lax.scan(rep, q, None, length=reps)
        return x

    res = {}
    for name, fn in [("multi_merged", run_multi), ("split_einsum", run_split),
                     ("multi_matmul", run_mm), ("split_einsum_2", run_split),
                     ("multi_matmul_2", run_mm)]:
        res[name + "_us_per_layer"] = round(bench(fn), 2)
        print(name, res[name + "_us_per_layer"], "us/layer", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
