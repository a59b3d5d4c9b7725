"""Encoder ablation round 2: isolate attention-math cost & kernel choices.

All variants: large-v3 encoder shape, 32 layers, bs16, bf16, scan.
  einsum_attn   : current default (LN+QKVO+scores/softmax/av), no MLP
  proj_only     : LN+QKVO projections, attention math replaced by identity
  flash_attn    : pallas flash kernel (512 blocks), no MLP
  splash_attn   : pallas splash kernel (maxtext's), no MLP
"""

import functools
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
    from distil_whisper_tpu.models.whisper import (
        layer_norm, dense, _split_heads, _merge_heads)
    from distil_whisper_tpu.ops.attention import mha, flash_padded

    cfg = PRESETS["large-v3"].replace(fast_bf16_attention=True)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    B, T, H, D = 16, 1536, 20, 64
    x0 = jnp.asarray(rng.standard_normal((B, T, cfg.d_model)), jnp.bfloat16)
    seg = (jax.lax.broadcasted_iota(jnp.int32, (B, T), 1) < 1500
           ).astype(jnp.int32)

    # splash kernel: one instance per (head-shape); vmap over batch
    def make_splash():
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk, splash_attention_mask as sm)
        mask = sm.MultiHeadMask(
            [sm.FullMask((T, T)) for _ in range(H)])
        kernel = sk.make_splash_mha(
            mask=mask, head_shards=1, q_seq_shards=1)

        def attn(q, k, v):
            # splash wants [H, T, D] per example; scale q like sdpa
            q = q * (D ** -0.5)
            return jax.vmap(kernel)(q.transpose(0, 2, 1, 3),
                                    k.transpose(0, 2, 1, 3),
                                    v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
        return attn

    def make_enc(kind):
        splash = make_splash() if kind == "splash" else None

        def enc(p, x):
            def body(carry, lp):
                x = carry
                r = x
                h = layer_norm(lp["self_attn_ln"], x)
                q = _split_heads(dense(lp["self_attn"]["q"], h), H)
                k = _split_heads(dense(lp["self_attn"]["k"], h), H)
                v = _split_heads(dense(lp["self_attn"]["v"], h), H)
                if kind == "einsum":
                    a = mha(q, k, v, float32_logits=False)
                elif kind == "proj":
                    a = q
                elif kind == "flash":
                    a = flash_padded(q, k, v, seg)
                elif kind == "splash":
                    a = splash(q, k, v)
                x = r + dense(lp["self_attn"]["out"], _merge_heads(a))
                return x, None
            y, _ = jax.lax.scan(body, x, p["layers"])
            return y[:, :2, :2]
        return jax.jit(enc)

    res = {}
    for kind in ("einsum", "proj", "flash", "splash"):
        try:
            res[kind] = round(timeit(make_enc(kind), params["encoder"], x0)
                              * 1e3, 1)
            print(kind, res[kind], "ms", flush=True)
        except Exception as e:  # noqa: BLE001
            import traceback; traceback.print_exc()
            print(kind, "FAILED", str(e)[:200], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
