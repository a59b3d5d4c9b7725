"""Custom encoder-attention kernel vs jax flash vs einsum, in-scan, on-chip.

32-layer attention-only encoder at bs16, T=1536, H=20, D=64, bf16.
"""

import json
import time

import numpy as np


def fetch(x):
    np.asarray(x)


def timeit(fn, *a, iters=4):
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
    from distil_whisper_tpu.ops.attention import mha
    from distil_whisper_tpu.ops.encoder_attention import fused_self_attention

    cfg = PRESETS["large-v3"].replace(fast_bf16_attention=True)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    B, T, H = 16, 1536, 20
    x0 = jnp.asarray(rng.standard_normal((B, T, cfg.d_model)), jnp.bfloat16)
    def make_enc(kind, **kw):
        def enc(p, x):
            def body(carry, lp):
                x = carry
                r = x
                h = layer_norm(lp["self_attn_ln"], x)
                if kind == "custom":
                    x = r + fused_self_attention(lp["self_attn"], h, H, 1500,
                                                 **kw)
                    return x, None
                q = _split_heads(dense(lp["self_attn"]["q"], h), H)
                k = _split_heads(dense(lp["self_attn"]["k"], h), H)
                v = _split_heads(dense(lp["self_attn"]["v"], h), H)
                if kind == "einsum":
                    a = mha(q, k, v, float32_logits=False)
                x = r + dense(lp["self_attn"]["out"], _merge_heads(a))
                return x, None
            y, _ = jax.lax.scan(body, x, p["layers"])
            return y[:, :2, :2]
        return jax.jit(enc)

    res = {}
    for name, kind, kw in [
        ("custom_q512_f32exp", "custom", dict(block_q=512, exp_impl="f32")),
        ("custom_q512_polyexp", "custom", dict(block_q=512, exp_impl="poly")),
        ("custom_q256_polyexp", "custom", dict(block_q=256, exp_impl="poly")),
        ("custom_q512_poly_qkv", "custom",
         dict(block_q=512, exp_impl="poly", fused_qkv=True)),
        ("custom_q512_f32_qkv", "custom",
         dict(block_q=512, exp_impl="f32", fused_qkv=True)),
        ("custom_q1536_polyexp", "custom",
         dict(block_q=1536, exp_impl="poly")),
    ]:
        try:
            t = timeit(make_enc(kind, **kw), params["encoder"], x0)
            res[name] = round(t * 1e3, 1)
            print(name, res[name], "ms", flush=True)
        except Exception as e:  # noqa: BLE001
            import traceback; traceback.print_exc()
            print(name, "FAILED", str(e)[:200], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
