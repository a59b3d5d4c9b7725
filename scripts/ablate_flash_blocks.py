"""Flash block-size sweep measured INSIDE a 32-layer scan (real conditions),
plus decode-loop variant timing.

Part A: attention-only encoder (proj+flash) for block configs.
Part B: distil-large-v3 decode loop variants at bs16:
  current / no-cond (always decode) / no-processors / fori_loop
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
    from distil_whisper_tpu.ops.attention import flash_padded

    cfg = PRESETS["large-v3"].replace(fast_bf16_attention=True)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    B, T, H = 16, 1536, 20
    x0 = jnp.asarray(rng.standard_normal((B, T, cfg.d_model)), jnp.bfloat16)
    seg = (jax.lax.broadcasted_iota(jnp.int32, (B, T), 1) < 1500
           ).astype(jnp.int32)
    res = {}

    def make_enc(bq, bk):
        def enc(p, x):
            def body(carry, lp):
                x = carry
                r = x
                h = layer_norm(lp["self_attn_ln"], x)
                q = _split_heads(dense(lp["self_attn"]["q"], h), H)
                k = _split_heads(dense(lp["self_attn"]["k"], h), H)
                v = _split_heads(dense(lp["self_attn"]["v"], h), H)
                a = flash_padded(q, k, v, seg, block_q=bq, block_k=bk)
                return r + dense(lp["self_attn"]["out"], _merge_heads(a)), None
            y, _ = jax.lax.scan(body, x, p["layers"])
            return y[:, :2, :2]
        return jax.jit(enc)

    for bq, bk in ((512, 512), (1536, 512), (512, 1536), (1536, 1536),
                   (768, 768), (1536, 768)):
        try:
            t = timeit(make_enc(bq, bk), params["encoder"], x0)
            res[f"flash_q{bq}_k{bk}"] = round(t * 1e3, 1)
            print(f"flash q{bq} k{bk}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"flash q{bq} k{bk}: FAILED {str(e)[:120]}", flush=True)

    # ---------------- Part B: decode loop variants ----------------
    from distil_whisper_tpu.models.whisper import decode, init_cache, cross_kv
    from distil_whisper_tpu.generation.generate import (
        GenerationOptions, _process_scores)
    from distil_whisper_tpu.generation import logits as L

    dcfg = PRESETS["distil-large-v3"].replace(fast_bf16_attention=True)
    dparams = init_params(dcfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    enc_states = jnp.asarray(rng.standard_normal((B, 1500, dcfg.d_model)),
                             jnp.bfloat16)
    opts = GenerationOptions(max_new_tokens=128, min_new_tokens=128)
    prompt = jnp.full((B, 1), dcfg.decoder_start_token_id, jnp.int32)

    def make_gen(variant):
        max_new = 128
        p = 1
        total = p + max_new

        def fn(dec, enc):
            cross = cross_kv(dec, dcfg, enc)
            cache = init_cache(dcfg, B, dtype=jnp.bfloat16, max_len=total)
            pre, cache = decode(dec, dcfg, prompt, cross=cross, cache=cache,
                                pos_offset=0, dtype=jnp.bfloat16)
            tokens = jnp.full((B, total), dcfg.pad_token_id, jnp.int32)
            state = dict(tokens=tokens, cache=cache,
                         last=pre[:, -1].astype(jnp.float32),
                         ts=L.TimestampState.init(B),
                         fin=jnp.zeros((B,), bool),
                         cur=jnp.asarray(p, jnp.int32))

            def body(s):
                if variant == "noproc":
                    nxt = jnp.argmax(s["last"], -1).astype(jnp.int32)
                else:
                    scores = _process_scores(s["last"], s["cur"] - p, s["ts"],
                                             dcfg, opts, p)
                    nxt = jnp.argmax(scores, -1).astype(jnp.int32)
                fin = jnp.logical_or(s["fin"], nxt == dcfg.eos_token_id)
                tokens = jax.lax.dynamic_update_slice(
                    s["tokens"], nxt[:, None], (0, s["cur"]))
                ts = s["ts"].update(nxt, dcfg.timestamp_begin)

                if variant == "cond":
                    def dd(c):
                        lg, c = decode(dec, dcfg, nxt[:, None], cross=cross,
                                       cache=c, pos_offset=s["cur"],
                                       dtype=jnp.bfloat16)
                        return lg[:, -1].astype(jnp.float32), c
                    last, cache = jax.lax.cond(
                        jnp.logical_and(s["cur"] + 1 < total, ~jnp.all(fin)),
                        dd, lambda c: (s["last"], c), s["cache"])
                else:
                    lg, cache = decode(dec, dcfg, nxt[:, None], cross=cross,
                                       cache=s["cache"], pos_offset=s["cur"],
                                       dtype=jnp.bfloat16)
                    last = lg[:, -1].astype(jnp.float32)
                return dict(tokens=tokens, cache=cache, last=last, ts=ts,
                            fin=fin, cur=s["cur"] + 1)

            if variant == "fori":
                state = jax.lax.fori_loop(0, max_new,
                                          lambda i, s: body(s), state)
            else:
                state = jax.lax.while_loop(
                    lambda s: jnp.logical_and(s["cur"] < total,
                                              ~jnp.all(s["fin"])),
                    body, state)
            return state["tokens"][:, :4]
        return jax.jit(fn)

    for variant in ("cond", "nocond", "noproc", "fori"):
        try:
            t = timeit(make_gen(variant), dparams["decoder"], enc_states)
            res[f"gen128_{variant}"] = round(t * 1e3, 1)
            print(f"gen128 {variant}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            import traceback; traceback.print_exc()
            print(f"gen128 {variant}: FAILED {str(e)[:120]}", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
