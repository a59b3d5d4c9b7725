"""Decode-loop ablation: KV-cache plumbing and storage layout.

Two suspects for the gap between measured per-token decode cost and the HBM
roofline (teacher 23.3 ms/token vs ~10 ms estimated):

1. **Cache write-back**: decode()'s cached path threads the self-attn cache
   through the layer scan as xs->ys, which rewrites the ENTIRE cache every
   token (teacher: 2x16.8 MB per layer per token ~ 1 GB/token of writes, plus
   whatever defensive copies the while_loop adds).  Variant `carry`: the cache
   rides the scan CARRY and each layer does one in-place
   dynamic_update_slice at (layer, :, pos) — only the new token's slice is
   written.
2. **Head-split storage**: [.., T, H, hd=64] puts 64 lanes on a 128-lane
   tile.  Variant `merged`: store cross-KV and cache as [.., T, H*hd] and
   compute the Tq=1 attention against the merged layout (block-diag q matmul
   for logits, 0/1-expansion matmul for the probs; k/v are only ever touched
   in native merged layout).

Timing: N decode steps inside ONE jit (fori_loop, argmax feedback); slope
between N=16 and N=128 -> ms/token (fetch round-trip cancels).
"""

import json
import os
import time

import numpy as np


def fetch(x):
    np.asarray(x)


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.models.whisper import (
        dense, layer_norm, _split_heads, _merge_heads, mlp_block, decode,
        init_cache, cross_kv)
    from distil_whisper_tpu.ops.attention import mha

    B = 16
    DTYPE = jnp.bfloat16
    results = {}

    def run(fn, iters=3):
        out = fn(); fetch(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(); fetch(out)
        return (time.perf_counter() - t0) / iters

    # ---------------- attention variants (Tq=1) ----------------

    def attn_split(q, k, v, n_heads, mask=None):
        # q [B, D]; k/v [B, T, H, hd] (the current model layout + VPU path)
        b, d = q.shape
        hd = d // n_heads
        return mha(q.reshape(b, 1, n_heads, hd), k, v, mask,
                   float32_logits=False).reshape(b, d)

    def attn_merged(q, k, v, n_heads, mask=None):
        # q [B, D]; k/v [B, T, D] merged
        b, t, d = k.shape
        hd = d // n_heads
        scale = jnp.asarray(hd ** -0.5, q.dtype)
        eye = jnp.eye(n_heads, dtype=q.dtype)
        qm = ((q * scale).reshape(b, n_heads, hd, 1)
              * eye[:, None, :]).reshape(b, d, n_heads)   # block-diag [B,D,H]
        lg = jax.lax.dot_general(k, qm, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)  # [B,T,H]
        if mask is not None:
            lg = jnp.where(mask[:, :, None], lg, -1e9)
        p = jax.nn.softmax(lg, axis=1).astype(q.dtype)
        expand = jnp.repeat(eye, hd, axis=1)              # [H, D] 0/1
        pe = jax.lax.dot_general(p, expand, (((2,), (0,)), ((), ())))
        out = jnp.sum((pe * v).astype(jnp.float32), axis=1)
        return out.astype(q.dtype)

    # ---------------- one decode step, parameterised ----------------

    def make_step(cfg, merged, carry_cache):
        n_heads = cfg.decoder_attention_heads
        hd = cfg.d_model // n_heads
        attn = attn_merged if merged else attn_split
        unroll = cfg.decoder_layers if cfg.decoder_layers <= 4 else 1

        def reshape_kv(x):          # [B, T(,H,hd)] view for the split path
            if merged:
                return x
            b, t = x.shape[0], x.shape[1]
            return x.reshape(b, t, n_heads, hd)

        def step(dec, cfg_, tok, cache, cross, pos):
            x = dec["tok_emb"].astype(DTYPE)[tok[:, 0]]
            x = x + jax.lax.dynamic_slice_in_dim(
                dec["pos_emb"].astype(DTYPE), pos, 1, axis=0)[0]
            tk = cache["k"].shape[2]
            key_slots = jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
            mask = key_slots <= pos
            mask4 = mask[:, None, None, :] if not merged else mask

            def layer_body(x, lp, ck, cv, ck_l, cv_l):
                h = layer_norm(lp["self_attn_ln"], x)
                q = dense(lp["self_attn"]["q"], h)
                a = attn(q, ck_l, cv_l, n_heads,
                         mask if merged else mask4)
                x = x + dense(lp["self_attn"]["out"], a[:, None])[:, 0]
                h = layer_norm(lp["cross_attn_ln"], x)
                q = dense(lp["cross_attn"]["q"], h)
                a = attn(q, ck, cv, n_heads)
                x = x + dense(lp["cross_attn"]["out"], a[:, None])[:, 0]
                h = layer_norm(lp["final_ln"], x)
                return x + mlp_block(lp["fc1"], lp["fc2"], h)

            if carry_cache:
                def body(carry, xs):
                    x, cache_k, cache_v = carry
                    i, lp, ck, cv = xs
                    h = layer_norm(lp["self_attn_ln"], x)
                    k_new = dense(lp["self_attn"]["k"], h)
                    v_new = dense(lp["self_attn"]["v"], h)
                    idx = (i,) + (0,) * (cache_k.ndim - 1)
                    upd_shape = ((1, k_new.shape[0], 1, k_new.shape[1])
                                 if merged else
                                 (1, k_new.shape[0], 1, n_heads, hd))
                    start = ((i, 0, pos, 0) if merged else (i, 0, pos, 0, 0))
                    cache_k = jax.lax.dynamic_update_slice(
                        cache_k, k_new.reshape(upd_shape).astype(cache_k.dtype),
                        start)
                    cache_v = jax.lax.dynamic_update_slice(
                        cache_v, v_new.reshape(upd_shape).astype(cache_v.dtype),
                        start)
                    ck_l = reshape_kv(jax.lax.dynamic_index_in_dim(
                        cache_k, i, 0, keepdims=False).astype(DTYPE))
                    cv_l = reshape_kv(jax.lax.dynamic_index_in_dim(
                        cache_v, i, 0, keepdims=False).astype(DTYPE))
                    y = layer_body(x, lp, ck, cv, ck_l, cv_l)
                    return (y, cache_k, cache_v), None

                L = cfg_.decoder_layers
                (y, nk, nv), _ = jax.lax.scan(
                    body, (x, cache["k"], cache["v"]),
                    (jnp.arange(L), dec["layers"], cross["k"], cross["v"]),
                    unroll=unroll)
                new_cache = {"k": nk, "v": nv}
            else:
                def body(x, xs):
                    lp, ck, cv, cache_k, cache_v = xs
                    h = layer_norm(lp["self_attn_ln"], x)
                    k_new = dense(lp["self_attn"]["k"], h)
                    v_new = dense(lp["self_attn"]["v"], h)
                    upd = (k_new[:, None] if merged
                           else k_new.reshape(-1, 1, n_heads, hd))
                    updv = (v_new[:, None] if merged
                            else v_new.reshape(-1, 1, n_heads, hd))
                    cache_k = jax.lax.dynamic_update_slice_in_dim(
                        cache_k, upd.astype(cache_k.dtype), pos, axis=1)
                    cache_v = jax.lax.dynamic_update_slice_in_dim(
                        cache_v, updv.astype(cache_v.dtype), pos, axis=1)
                    y = layer_body(x, lp, ck, cv,
                                   reshape_kv(cache_k.astype(DTYPE)),
                                   reshape_kv(cache_v.astype(DTYPE)))
                    return y, (cache_k, cache_v)

                y, (nk, nv) = jax.lax.scan(
                    body, x, (dec["layers"], cross["k"], cross["v"],
                              cache["k"], cache["v"]), unroll=unroll)
                new_cache = {"k": nk, "v": nv}

            y = layer_norm(dec["ln"], y)
            logits = jnp.einsum("bd,vd->bv", y, dec["tok_emb"].astype(DTYPE),
                                preferred_element_type=jnp.float32)
            return logits, new_cache

        return step

    def build(params, cfg, enc, n, merged, carry_cache):
        dec = params["decoder"]
        L = cfg.decoder_layers
        step = make_step(cfg, merged, carry_cache)
        max_len = n + 1

        def cross_merged(dec):
            def per_layer(lp):
                return (dense(lp["cross_attn"]["k"], enc),
                        dense(lp["cross_attn"]["v"], enc))
            k, v = jax.lax.map(per_layer, dec["layers"])
            return {"k": k, "v": v}

        @jax.jit
        def fn(dec, enc):
            if merged:
                cross = cross_merged(dec)
                cache = {"k": jnp.zeros((L, B, max_len, cfg.d_model), DTYPE),
                         "v": jnp.zeros((L, B, max_len, cfg.d_model), DTYPE)}
            else:
                cross = cross_kv(dec, cfg, enc)
                cache = init_cache(cfg, B, dtype=DTYPE, max_len=max_len)
            tok0 = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)

            def body(i, s):
                tok, cache, acc = s
                logits, cache = step(dec, cfg, tok, cache, cross, i)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
                return (nxt, cache, acc + logits[0, :1])

            _, _, acc = jax.lax.fori_loop(
                0, n, body, (tok0, cache, jnp.zeros((1,), jnp.float32)))
            return acc
        return lambda: fn(dec, enc)

    def build_model_decode(params, cfg, enc, n):
        """The production decode() in the same loop, as the reference point."""
        dec = params["decoder"]
        max_len = n + 1

        @jax.jit
        def fn(dec, enc):
            cross = cross_kv(dec, cfg, enc)
            cache = init_cache(cfg, B, dtype=DTYPE, max_len=max_len)
            tok0 = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)

            def body(i, s):
                tok, cache, acc = s
                logits, cache = decode(dec, cfg, tok, cross=cross,
                                       cache=cache, pos_offset=i, dtype=DTYPE)
                lg = logits[:, -1]
                nxt = jnp.argmax(lg, -1).astype(jnp.int32)[:, None]
                return (nxt, cache, acc + lg[0, :1])

            _, _, acc = jax.lax.fori_loop(
                0, n, body, (tok0, cache, jnp.zeros((1,), jnp.float32)))
            return acc
        return lambda: fn(dec, enc)

    presets = os.environ.get("ABL_PRESETS", "distil-large-v3,large-v3")
    for preset in presets.split(","):
        cfg = PRESETS[preset].replace(fast_bf16_attention=True)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=DTYPE)
        rng = np.random.default_rng(0)
        enc = jnp.asarray(rng.standard_normal((B, 1500, cfg.d_model)) * 0.1,
                          DTYPE)
        variants = {
            "model_decode": lambda n: build_model_decode(params, cfg, enc, n),
            "split_scanio": lambda n: build(params, cfg, enc, n, False, False),
            "split_carry": lambda n: build(params, cfg, enc, n, False, True),
            "merged_scanio": lambda n: build(params, cfg, enc, n, True, False),
            "merged_carry": lambda n: build(params, cfg, enc, n, True, True),
        }
        for name, make in variants.items():
            try:
                t16 = run(make(16))
                t128 = run(make(128))
                slope = (t128 - t16) / 112.0 * 1e3
                results[f"{preset}/{name}"] = round(slope, 3)
                print(f"{preset}/{name}: {slope:.3f} ms/token "
                      f"(t16 {t16*1e3:.0f} ms, t128 {t128*1e3:.0f} ms)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                import traceback; traceback.print_exc()
                print(f"{preset}/{name} FAILED {str(e)[:200]}", flush=True)
        del params

    print(json.dumps(results))


if __name__ == "__main__":
    main()
