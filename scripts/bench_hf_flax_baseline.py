"""Reference-implementation baseline on the SAME chip: HF FlaxWhisper RTFx.

The reference's published "6.3x relative latency" (reference README.md:15)
compares distil-large-v3 to large-v3 inside the reference stack.  This script
measures that stack itself — ``transformers.FlaxWhisperForConditionalGeneration``
with its stock ``generate`` loop, the exact model class the reference's
``training/flax`` path wraps (modeling_flax_whisper.py subclasses it) — on the
same TPU, same protocol as our bench.py (bs16, bf16, fixed token budget,
random weights), giving the absolute anchor for "what a user switches from":

    vs_reference-stack = ours_rtfx / hf_flax_rtfx   (per model)

Run:  BENCH_TOKENS=256 python scripts/bench_hf_flax_baseline.py
Note: the stock HF flax decoder is unrolled (no scan) — first compile of
large-v3 through the tunnel takes several minutes.
"""

import json
import os
import time

import numpy as np


def fetch(x):
    np.asarray(x)


CFGS = {
    "distil-large-v3": dict(encoder_layers=32, decoder_layers=2),
    "large-v3": dict(encoder_layers=32, decoder_layers=32),
}


def main():
    import jax
    import jax.numpy as jnp
    from transformers import FlaxWhisperForConditionalGeneration, WhisperConfig

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    max_new = int(os.environ.get("BENCH_TOKENS", "256"))
    results = {}
    for name, depths in CFGS.items():
        cfg = WhisperConfig(
            vocab_size=51866, num_mel_bins=128, d_model=1280,
            encoder_attention_heads=20, decoder_attention_heads=20,
            encoder_ffn_dim=5120, decoder_ffn_dim=5120,
            max_source_positions=1500, max_target_positions=448,
            **depths)
        model = FlaxWhisperForConditionalGeneration(
            cfg, dtype=jnp.bfloat16, _do_init=True, seed=0)
        params = model.to_bf16(model.params)

        rng = np.random.default_rng(0)
        mel = jnp.asarray(
            rng.standard_normal((batch, cfg.num_mel_bins,
                                 2 * cfg.max_source_positions)), jnp.bfloat16)

        from transformers import GenerationConfig
        gcfg = GenerationConfig(
            max_length=1 + max_new, min_length=1 + max_new,
            do_sample=False, num_beams=1,
            decoder_start_token_id=cfg.decoder_start_token_id,
            bos_token_id=cfg.bos_token_id, eos_token_id=cfg.eos_token_id,
            pad_token_id=cfg.pad_token_id)

        @jax.jit
        def gen(params, mel):
            out = model.generate(mel, params=params, generation_config=gcfg)
            return out.sequences

        out = gen(params, mel); fetch(out)           # compile + warmup
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            out = gen(params, mel); fetch(out)
        dt = (time.perf_counter() - t0) / iters
        rtfx = batch * 30.0 / dt
        results[name] = round(rtfx, 2)
        print(f"{name}: HF-flax RTFx {rtfx:.1f} ({dt*1e3:.0f} ms/batch)",
              flush=True)
        del model, params

    results["ratio"] = round(results["distil-large-v3"] / results["large-v3"],
                             2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
