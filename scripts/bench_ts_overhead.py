"""Quantify the per-token cost of the timestamp FSM + no-speech probe:
large-v3, bs16, 256 tokens, with/without return_timestamps, with/without
int8 cross-KV."""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.generation import GenerationOptions, build_generate

    res = {}
    rng = np.random.default_rng(0)
    for quant in (False, True):
        cfg = PRESETS["large-v3"].replace(fast_bf16_attention=True,
                                          use_flash_encoder=True,
                                          quantize_cross_kv=quant)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        mel = jnp.asarray(rng.standard_normal((16, cfg.num_mel_bins, 3000)),
                          jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        for ts in (False, True):
            opts = GenerationOptions(
                max_new_tokens=256, min_new_tokens=256, return_timestamps=ts,
                no_speech_token_id=cfg.vocab_size - 1505 if ts else None)
            fn = build_generate(cfg, opts, dtype=jnp.bfloat16)
            prompt = jnp.full((16, 1), cfg.decoder_start_token_id, jnp.int32)
            out = fn(params, mel, prompt, 0.0, key); np.asarray(out.seq_len)
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(params, mel, prompt, 0.0, key)
                np.asarray(out.seq_len)
            dt = (time.perf_counter() - t0) / 3
            name = f"q{int(quant)}_ts{int(ts)}"
            res[name] = round(dt * 1e3, 1)
            print(name, res[name], "ms  rtfx", round(480 / dt, 1), flush=True)
        del params
    print(json.dumps(res))


if __name__ == "__main__":
    main()
