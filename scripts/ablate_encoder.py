"""Encoder time ablation on-chip: which sub-block costs what.

Variants (large-v3 encoder, bs16 bf16, one jit each, amortised over iters):
  full / no-attention / no-mlp / conv-stem-only / no-layernorm-fp32 /
  qkv-fused-estimate (attention with 1 big matmul instead of 3)
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
    from distil_whisper_tpu.models.whisper import (
        _conv1d, layer_norm, mlp_block, attention_block, dense,
        _split_heads, _merge_heads)
    from distil_whisper_tpu.ops.attention import mha

    cfg = PRESETS["large-v3"].replace(fast_bf16_attention=True)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((16, cfg.num_mel_bins, 3000)),
                      jnp.bfloat16)
    res = {}

    def stem(p, mel):
        x = mel.transpose(0, 2, 1)
        x = jax.nn.gelu(_conv1d(p["conv1"], x, 1), approximate=False)
        x = jax.nn.gelu(_conv1d(p["conv2"], x, 2), approximate=False)
        return x + p["pos_emb"].astype(x.dtype)

    res["conv_stem"] = timeit(
        jax.jit(lambda p, m: stem(p, m)[:, :2, :2]), params["encoder"], mel)
    print("conv_stem", res["conv_stem"], flush=True)

    def make_enc(attn=True, mlp=True, ln_fp32=True, fused_qkv=False):
        def enc(p, mel):
            x = stem(p, mel)
            def body(carry, lp):
                x = carry
                if attn:
                    r = x
                    h = layer_norm(lp["self_attn_ln"], x, fp32=ln_fp32)
                    if fused_qkv:
                        wk = jnp.concatenate(
                            [lp["self_attn"][n]["kernel"] for n in
                             ("q", "k", "v")], axis=1)
                        qkv = jnp.einsum("...i,io->...o", h, wk.astype(h.dtype),
                                         preferred_element_type=jnp.float32
                                         ).astype(h.dtype)
                        q, k, v = jnp.split(qkv, 3, axis=-1)
                        q = q + lp["self_attn"]["q"]["bias"].astype(h.dtype)
                        v = v + lp["self_attn"]["v"]["bias"].astype(h.dtype)
                        q, k, v = (_split_heads(t, 20) for t in (q, k, v))
                        a = mha(q, k, v, float32_logits=False)
                        h = dense(lp["self_attn"]["out"], _merge_heads(a))
                    else:
                        h = attention_block(lp["self_attn"], h, h, 20,
                                            f32_attn=False)
                    x = r + h
                if mlp:
                    r = x
                    h = layer_norm(lp["final_ln"], x, fp32=ln_fp32)
                    h = mlp_block(lp["fc1"], lp["fc2"], h)
                    x = r + h
                return x, None
            y, _ = jax.lax.scan(body, x, p["layers"])
            y = layer_norm(p["ln_post"], y)
            return y[:, :2, :2]
        return jax.jit(enc)

    for name, kw in [
        ("full", {}),
        ("no_attention", {"attn": False}),
        ("no_mlp", {"mlp": False}),
        ("ln_bf16", {"ln_fp32": False}),
        ("fused_qkv", {"fused_qkv": True}),
    ]:
        try:
            res[name] = timeit(make_enc(**kw), params["encoder"], mel)
            print(name, res[name], flush=True)
        except Exception as e:  # noqa: BLE001
            print(name, "FAILED", e, flush=True)

    print(json.dumps({k: round(v * 1e3, 1) for k, v in res.items()}))


if __name__ == "__main__":
    main()
