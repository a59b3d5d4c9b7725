"""Where do distil generate's non-layer costs go? (bs16, bf16, 256 tokens)

HF-flax distil on the same chip runs the same protocol ~4% faster — find the
gap.  Times (fetch amortised by in-jit repetition where needed):

  ours_encoder      encode + cross_kv, x4 inside one jit
  ours_encoder_xla  same with use_flash_encoder=False
  hf_encoder        stock FlaxWhisperModel encoder, x4 inside one jit
  ours_gen_full     production build_generate (opts as bench.py headline)
  ours_gen_nologp   production loop minus sum_logprobs/log_softmax
  ours_gen_bare     stripped loop: prefill + argmax feedback only
  hf_gen            stock HF flax generate (min_length pinned)
"""

import json
import os
import time

import numpy as np


def fetch(x):
    np.asarray(x)


def run(fn, iters=3):
    out = fn(); fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(); fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.models.whisper import encode, cross_kv, decode, \
        init_cache
    from distil_whisper_tpu.generation import GenerationOptions, build_generate

    B = 16
    MAX_NEW = int(os.environ.get("BENCH_TOKENS", "256"))
    res = {}

    cfg = PRESETS["distil-large-v3"].replace(fast_bf16_attention=True,
                                             use_flash_encoder=True)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, cfg.num_mel_bins, 3000)),
                      jnp.bfloat16)
    prompt = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)
    key = jax.random.PRNGKey(0)

    def enc_loop(cfg_enc):
        @jax.jit
        def fn(params, mel):
            acc = jnp.zeros((1,), jnp.float32)
            m = mel
            for i in range(4):
                e = encode(params["encoder"], cfg_enc, m, dtype=jnp.bfloat16)
                c = cross_kv(params["decoder"], cfg_enc, e)
                acc = acc + c["k"][0, 0, 0, :1].astype(jnp.float32)
                m = mel + acc[0].astype(mel.dtype) * 0  # serialise iterations
            return acc
        return lambda: fn(params, mel)

    res["ours_encoder"] = round(run(enc_loop(cfg)) / 4 * 1e3, 1)
    print("ours_encoder", res["ours_encoder"], "ms", flush=True)
    res["ours_encoder_xla"] = round(
        run(enc_loop(cfg.replace(use_flash_encoder=False))) / 4 * 1e3, 1)
    print("ours_encoder_xla", res["ours_encoder_xla"], "ms", flush=True)

    opts = GenerationOptions(max_new_tokens=MAX_NEW, min_new_tokens=MAX_NEW)
    gen = build_generate(cfg, opts, dtype=jnp.bfloat16)
    res["ours_gen_full"] = round(
        run(lambda: gen(params, mel, prompt, 0.0, key).seq_len) * 1e3, 1)
    print("ours_gen_full", res["ours_gen_full"], "ms", flush=True)

    # ---- stripped loops ----
    def build_stripped(with_logp):
        total = 1 + MAX_NEW

        @jax.jit
        def fn(params, mel, prompt):
            enc = encode(params["encoder"], cfg, mel, dtype=jnp.bfloat16)
            cross = cross_kv(params["decoder"], cfg, enc)
            cache = init_cache(cfg, B, dtype=jnp.bfloat16, max_len=total)
            lg, cache = decode(params["decoder"], cfg, prompt, cross=cross,
                               cache=cache, pos_offset=0, dtype=jnp.bfloat16)

            def body(i, s):
                last, cache, acc = s
                nxt = jnp.argmax(last, -1).astype(jnp.int32)
                if with_logp:
                    lse = jax.nn.logsumexp(last, axis=-1)
                    acc = acc + jnp.sum(
                        jnp.take_along_axis(last, nxt[:, None], -1)[:, 0]
                        - lse)
                lg, cache = decode(params["decoder"], cfg, nxt[:, None],
                                   cross=cross, cache=cache, pos_offset=i + 1,
                                   dtype=jnp.bfloat16)
                return (lg[:, -1].astype(jnp.float32), cache, acc)

            last, cache, acc = jax.lax.fori_loop(
                0, MAX_NEW, body,
                (lg[:, -1].astype(jnp.float32), cache,
                 jnp.zeros((), jnp.float32)))
            return acc
        return lambda: fn(params, mel, prompt)

    res["ours_gen_bare"] = round(run(build_stripped(False)) * 1e3, 1)
    print("ours_gen_bare", res["ours_gen_bare"], "ms", flush=True)
    res["ours_gen_logp"] = round(run(build_stripped(True)) * 1e3, 1)
    print("ours_gen_logp", res["ours_gen_logp"], "ms", flush=True)
    del params

    # ---- HF flax reference ----
    from transformers import (FlaxWhisperForConditionalGeneration,
                              WhisperConfig, GenerationConfig)
    hf_cfg = WhisperConfig(
        vocab_size=51866, num_mel_bins=128, d_model=1280,
        encoder_attention_heads=20, decoder_attention_heads=20,
        encoder_ffn_dim=5120, decoder_ffn_dim=5120,
        max_source_positions=1500, max_target_positions=448,
        encoder_layers=32, decoder_layers=2)
    model = FlaxWhisperForConditionalGeneration(hf_cfg, dtype=jnp.bfloat16,
                                                _do_init=True, seed=0)
    hf_params = model.to_bf16(model.params)

    @jax.jit
    def hf_enc(hf_params, mel):
        acc = jnp.zeros((1,), jnp.float32)
        m = mel
        for i in range(4):
            e = model.encode(m, params=hf_params).last_hidden_state
            acc = acc + e[0, 0, :1].astype(jnp.float32)
            m = mel + acc[0].astype(mel.dtype) * 0
        return acc

    res["hf_encoder"] = round(run(lambda: hf_enc(hf_params, mel)) / 4 * 1e3, 1)
    print("hf_encoder", res["hf_encoder"], "ms", flush=True)

    gcfg = GenerationConfig(
        max_length=1 + MAX_NEW, min_length=1 + MAX_NEW, do_sample=False,
        num_beams=1, decoder_start_token_id=hf_cfg.decoder_start_token_id,
        bos_token_id=hf_cfg.bos_token_id, eos_token_id=hf_cfg.eos_token_id,
        pad_token_id=hf_cfg.pad_token_id)

    @jax.jit
    def hf_gen(hf_params, mel):
        return model.generate(mel, params=hf_params,
                              generation_config=gcfg).sequences

    res["hf_gen"] = round(run(lambda: hf_gen(hf_params, mel)) * 1e3, 1)
    print("hf_gen", res["hf_gen"], "ms", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
