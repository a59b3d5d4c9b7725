"""Per-token decode component microbench (distil-large-v3 decoder, bs16).

Runs 128 iterations of each component inside one jit:
  embed+pos / self-attn(cached) / cross-attn / mlp / vocab-matmul / full-layer
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
        layer_norm, dense, _split_heads, _merge_heads, mlp_block)
    from distil_whisper_tpu.ops.attention import mha

    cfg = PRESETS["distil-large-v3"].replace(fast_bf16_attention=True)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    dec = params["decoder"]
    rng = np.random.default_rng(0)
    B, H, D = 16, 20, 64
    x1 = jnp.asarray(rng.standard_normal((B, 1, cfg.d_model)), jnp.bfloat16)
    ck = jnp.asarray(rng.standard_normal((B, 1500, H, D)), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((B, 1500, H, D)), jnp.bfloat16)
    sk = jnp.asarray(rng.standard_normal((B, 129, H, D)), jnp.bfloat16)
    lp = jax.tree.map(lambda a: a[0], dec["layers"])  # layer 0 weights

    def loop(step):
        def fn(x):
            def body(c, _):
                return step(c), None
            y, _ = jax.lax.scan(body, x, None, length=128)
            return y[:, :, :2]
        return jax.jit(fn)

    res = {}

    def norm_step(x):  # keep loop non-trivial, negligible cost itself
        return x * jnp.bfloat16(0.999)

    variants = {}
    variants["selfattn"] = lambda x: x + dense(
        lp["self_attn"]["out"], _merge_heads(mha(
            _split_heads(dense(lp["self_attn"]["q"],
                               layer_norm(lp["self_attn_ln"], x)), H),
            sk, sk, float32_logits=False)))
    variants["crossattn"] = lambda x: x + dense(
        lp["cross_attn"]["out"], _merge_heads(mha(
            _split_heads(dense(lp["cross_attn"]["q"],
                               layer_norm(lp["cross_attn_ln"], x)), H),
            ck, cv, float32_logits=False)))
    variants["mlp"] = lambda x: x + mlp_block(
        lp["fc1"], lp["fc2"], layer_norm(lp["final_ln"], x))
    variants["vocab"] = lambda x: x + jnp.einsum(
        "bsd,vd->bsv", layer_norm(dec["ln"], x),
        dec["tok_emb"].astype(x.dtype),
        preferred_element_type=jnp.float32)[:, :, :cfg.d_model].astype(x.dtype) * jnp.bfloat16(1e-3)

    # cross-attn via VPU-friendly formulation: logits = sum over D of q*k
    def cross_vpu(x):
        q = _split_heads(dense(lp["cross_attn"]["q"],
                               layer_norm(lp["cross_attn_ln"], x)), H)
        scale = jnp.bfloat16(D ** -0.5)
        logits = jnp.sum(q * scale * ck, axis=-1)          # [B,1500,H] wrong q broadcast
        # proper: q [B,1,H,D] * k [B,T,H,D] -> sum D -> [B,T,H]
        probs = jax.nn.softmax(logits, axis=1)
        a = jnp.sum(probs[..., None] * cv, axis=1)          # [B,H,D]
        return x + dense(lp["cross_attn"]["out"],
                         a.reshape(B, 1, H * D))
    variants["crossattn_vpu"] = cross_vpu

    for name, step in variants.items():
        try:
            t = timeit(loop(step), x1)
            res[name] = round(t / 128 * 1e6, 1)  # us per token-step
            print(name, res[name], "us/step", flush=True)
        except Exception as e:  # noqa: BLE001
            import traceback; traceback.print_exc()
            print(name, "FAILED", str(e)[:150], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
