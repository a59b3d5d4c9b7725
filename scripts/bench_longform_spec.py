"""On-chip long-form A/B: plain greedy vs prompt-lookup (ngram) speculation
on BOTH long-form modes (VERDICT r4 #1c/#2).

Arms share one process and one compiled stack per mode; ngram speculation is
token-identical to plain greedy, so both arms walk the SAME windows/cursors —
the comparison is perfectly paired and any window-crawl from random weights
cancels.  Random weights are the honest floor for lookup acceptance
(untrained models loop, which yields some free drafts but far less than
condition-on-prev repetition on real speech); the ceiling is the
synthetic-period window program, timed separately at bs1.

  INT8=1 BENCH_MINUTES=3 GAMMA=5 python scripts/bench_longform_spec.py
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.generation.sequential import (SequentialOptions,
                                                          SequentialTranscriber)
    from distil_whisper_tpu.pipeline import WhisperPipeline
    from distil_whisper_tpu.audio import compute_mel
    from distil_whisper_tpu.ops.quant import maybe_quantize_encoder
    from distil_whisper_tpu.tokenizer import WhisperTokenizer
    from distil_whisper_tpu.tokenizer.bpe import ByteLevelBPE, bytes_to_unicode
    from distil_whisper_tpu.parallel import make_mesh

    int8 = os.environ.get("INT8", "1") == "1"
    minutes = float(os.environ.get("BENCH_MINUTES", "3"))
    gamma = int(os.environ.get("GAMMA", "5"))
    max_new = int(os.environ.get("BENCH_TOKENS", "64"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "3"))
    res = {"int8": int8, "minutes": minutes, "gamma": gamma,
           "max_new_tokens": max_new}

    cfg = PRESETS["distil-large-v3"].replace(
        fast_bf16_attention=True, use_flash_encoder=True,
        quantize_encoder=int8, quantize_decoder=int8,
        quantize_self_kv=int8, quantize_cross_kv=int8)
    raw_params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    # the transcriber takes pre-quantized params; the pipeline quantizes
    # in its own constructor (it shards the raw tree first)
    params = maybe_quantize_encoder(raw_params, cfg)

    units = list(bytes_to_unicode().values())
    tok = WhisperTokenizer(
        ByteLevelBPE({u: i for i, u in enumerate(units)}, []),
        {"<|endoftext|>": 50257, "<|startoftranscript|>": 50258,
         "<|en|>": 50259, "<|translate|>": 50358, "<|transcribe|>": 50359,
         "<|startofprev|>": 50361, "<|nospeech|>": 50362,
         "<|notimestamps|>": 50363})

    rng = np.random.default_rng(0)
    n = int(minutes * 60 * 16000)
    t = np.arange(n) / 16000.0
    audio = (0.2 * np.sin(2 * np.pi * 220.0 * t)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)
    feats = np.asarray(compute_mel(jnp.asarray(audio), cfg,
                                   pad_to_chunk=False)[0])

    skip_seq = os.environ.get("SKIP_SEQ") == "1"
    skip_chunked = os.environ.get("SKIP_CHUNKED") == "1"

    # ---- sequential bs1 (condition_on_prev: the prompt embeds the
    # previous window's text — the prime n-gram source) ----
    seq_opts = SequentialOptions(
        temperatures=(0.0,), logprob_threshold=None,
        no_speech_threshold=None, compression_ratio_threshold=None,
        condition_on_prev_tokens=True, max_new_tokens=max_new)
    arms = {} if skip_seq else {
        "seq_plain": SequentialTranscriber(
            params, cfg, tok, seq_opts, language="en", batch_size=1,
            dtype=jnp.bfloat16),
        "seq_ngram": SequentialTranscriber(
            params, cfg, tok, seq_opts, language="en", batch_size=1,
            dtype=jnp.bfloat16, speculative_method="ngram", gamma=gamma),
    }
    if not skip_seq:
        texts = {}
        for name, tr in arms.items():  # compile + warm
            texts[name] = tr.transcribe([feats])[0]["text"]
        assert texts["seq_plain"] == texts["seq_ngram"], "identity violated"
        times = {name: [] for name in arms}
        for _ in range(rounds):
            for name, tr in arms.items():  # interleaved
                t0 = time.perf_counter()
                out = tr.transcribe([feats])
                times[name].append(time.perf_counter() - t0)
        n_seg = len(out[0]["segments"])
        for name in arms:
            med = float(np.median(times[name]))
            res[f"{name}_s"] = round(med, 2)
        res["seq_segments"] = n_seg
        ng = arms["seq_ngram"].spec_stats
        res["seq_ngram_accept_rate"] = round(
            ng["accepted"] / ng["drafted"], 3) if ng["drafted"] else None
        res["seq_speedup"] = round(res["seq_plain_s"] / res["seq_ngram_s"],
                                   3)
        print("sequential bs1:", {k: res[k] for k in
                                  ("seq_plain_s", "seq_ngram_s",
                                   "seq_speedup",
                                   "seq_ngram_accept_rate")}, flush=True)

    # ---- chunked pipeline (the single-long-file latency anchor,
    # reference README.md:285-290) ----
    if skip_chunked:
        print(json.dumps(res))
        return
    mesh1 = make_mesh(devices=jax.devices()[:1])
    common = dict(checkpoint=None, params=raw_params, cfg=cfg, tokenizer=tok,
                  dtype=jnp.bfloat16, batch_size=8, max_new_tokens=max_new,
                  mesh=mesh1)
    pipes = {
        "chunked_plain": WhisperPipeline(**common),
        "chunked_ngram": WhisperPipeline(**common,
                                         speculative_method="ngram",
                                         gamma=gamma),
    }
    ptexts = {}
    for name, pipe in pipes.items():  # compile + warm
        ptexts[name] = pipe(audio, chunk_length_s=30.0, language="en",
                            return_timestamps=True)["text"]
    assert ptexts["chunked_plain"] == ptexts["chunked_ngram"], \
        "identity violated"
    ptimes = {name: [] for name in pipes}
    for _ in range(rounds):
        for name, pipe in pipes.items():
            t0 = time.perf_counter()
            pipe(audio, chunk_length_s=30.0, language="en",
                 return_timestamps=True)
            ptimes[name].append(time.perf_counter() - t0)
    for name in pipes:
        res[f"{name}_s"] = round(float(np.median(ptimes[name])), 2)
    st = pipes["chunked_ngram"].spec_stats
    res["chunked_ngram_accept_rate"] = round(
        st["accepted"] / st["drafted"], 3) if st["drafted"] else None
    res["chunked_speedup"] = round(
        res["chunked_plain_s"] / res["chunked_ngram_s"], 3)
    res["chunked_rtfx_ngram"] = round(
        minutes * 60 / res["chunked_ngram_s"], 1)
    print("chunked bs8:", {k: res[k] for k in
                           ("chunked_plain_s", "chunked_ngram_s",
                            "chunked_speedup", "chunked_rtfx_ngram")},
          flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
