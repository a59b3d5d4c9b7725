"""One-process serving benchmark suite -> BENCH_SERVING_r*.json.

Runs every serving arm the round-4 verdict asked to see on an IDLE host
(microbatch vs continuous, admission-overlap A/B, speculative / ngram /
adaptive) in ONE process, flag-flipped between arms.  Student arms serve
distil-large-v3 (full int8 stack by default); teacher_* arms serve
whisper-large-v3 plain vs distil-drafted speculation — the end-to-end
serving payoff of the distil recipe.  One process matters:
the established protocol: a fresh process pays ~30 min of tunnel compiles
per arm, one process amortises them and keeps the chip state comparable
(docs/PERFORMANCE.md "one-process flag-flip is THE pattern").

  PYTHONPATH=/root/repo:/root/.axon_site BENCH_OUT=BENCH_SERVING_r05.json \
      python scripts/bench_serving_suite.py

Env: BENCH_BATCH (16), BENCH_CLIENTS (32), BENCH_REQS (2), BENCH_TOKENS
(96), BENCH_TOKENS_MIN (24), BENCH_INT8 (1), BENCH_BLOCK (16), BENCH_ACCEPT_HI (0.95),
BENCH_GAMMA (5), BENCH_ACCEPT (0.8), BENCH_PERIOD (24), BENCH_ARMS
(comma list to subset).
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_server import run_load  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.pipeline import WhisperPipeline
    from distil_whisper_tpu.serving import BatchingTranscriber
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    from distil_whisper_tpu.tokenizer import WhisperTokenizer

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    clients = int(os.environ.get("BENCH_CLIENTS", "32"))
    per_client = int(os.environ.get("BENCH_REQS", "2"))
    max_new = int(os.environ.get("BENCH_TOKENS", "96"))
    tok_min = int(os.environ.get("BENCH_TOKENS_MIN", "24"))
    int8 = os.environ.get("BENCH_INT8", "1") == "1"
    block = int(os.environ.get("BENCH_BLOCK", "16"))
    gamma = int(os.environ.get("BENCH_GAMMA", "5"))
    accept = float(os.environ.get("BENCH_ACCEPT", "0.8"))
    accept_hi = float(os.environ.get("BENCH_ACCEPT_HI", "0.95"))
    period = int(os.environ.get("BENCH_PERIOD", "24"))
    out_path = os.environ.get("BENCH_OUT", "BENCH_SERVING.json")

    def _quant(preset):
        return PRESETS[preset].replace(
            fast_bf16_attention=True, use_flash_encoder=True,
            quantize_encoder=int8, quantize_decoder=int8,
            quantize_self_kv=int8, quantize_cross_kv=int8,
            quantize_lm_head=int8)

    cfg = _quant("distil-large-v3")
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    d_cfg = PRESETS["distil-large-v3"].replace(
        fast_bf16_attention=True, use_flash_encoder=True)
    assistant = (init_params(d_cfg, jax.random.PRNGKey(3),
                             dtype=jnp.bfloat16), d_cfg)
    # the speculative arms serve the TEACHER (whisper-large-v3) with the
    # distil student as draft — the configuration where speculation pays
    # (drafting the 2-layer student against itself only measures overhead)
    t_cfg = _quant("large-v3")
    t_params = init_params(t_cfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16)

    import tests.helpers as H
    ck = "/tmp/bench_server_tok"
    if not os.path.isdir(ck):
        H.make_tiny_checkpoint(ck)
    tok = WhisperTokenizer.from_pretrained(ck)
    pipe = WhisperPipeline(ck, dtype=jnp.bfloat16, batch_size=batch,
                           max_new_tokens=max_new, params=params, cfg=cfg,
                           tokenizer=tok)
    t_pipe = WhisperPipeline(ck, dtype=jnp.bfloat16, batch_size=batch,
                             max_new_tokens=max_new, params=t_params,
                             cfg=t_cfg, tokenizer=tok)

    rng = np.random.default_rng(7)
    n_total = clients * per_client
    budgets = rng.integers(tok_min, max_new + 1, n_total)
    wav = (0.05 * rng.standard_normal(cfg.n_samples)).astype(np.float32)

    def microbatch(p=pipe, **kw):
        kw.setdefault("gamma", gamma)
        return BatchingTranscriber(p, batch_size=batch, max_wait_ms=100,
                                   default_language=kw.pop("lang", "en"),
                                   max_new_tokens=max_new, max_queue=10**9,
                                   **kw)

    def continuous(p=pipe, **kw):
        kw.setdefault("gamma", gamma)
        return ContinuousTranscriber(p, batch_size=batch,
                                     default_language=kw.pop("lang", "en"),
                                     max_new_tokens=max_new,
                                     block_steps=block, max_queue=10**9,
                                     **kw)

    # arm -> (builder, kwargs, env overrides active during the arm).
    # Student arms serve distil-large-v3 (the production serving config);
    # teacher_* arms serve whisper-large-v3, plain vs distil-drafted —
    # the end-to-end serving value of speculation.
    ARMS = {
        "microbatch_plain": (microbatch, {}, {}),
        "continuous_plain": (continuous, {}, {}),
        # admission-overlap A/B: language UNSET so every admission pays the
        # detect fetch — overlap hides it on the producer thread; the
        # inline arm reverts it onto the step loop
        "continuous_overlap_autolang": (continuous, {"lang": None}, {}),
        "continuous_inline_autolang": (continuous, {"lang": None},
                                       {"DWT_INLINE_ADMISSION": "1"}),
        # draft-free prompt lookup on the student (zero extra weights;
        # synthetic period-R oracle = repeating text, the lookup ceiling)
        "continuous_ngram": (continuous,
                             {"ngram_speculative": True,
                              "synthetic_period": period}, {}),
        "teacher_continuous_plain": (continuous, {"p": t_pipe}, {}),
        "teacher_microbatch_plain": (microbatch, {"p": t_pipe}, {}),
        "teacher_microbatch_spec": (microbatch,
                                    {"p": t_pipe, "assistant": assistant,
                                     "synthetic_acceptance": accept}, {}),
        "teacher_continuous_spec": (continuous,
                                    {"p": t_pipe, "assistant": assistant,
                                     "synthetic_acceptance": accept}, {}),
        # fixed double-length drafts: the oracle rung the adaptive
        # controller should (only) walk to at high acceptance — at 0.8 it
        # reproduces the measured gamma=10 regression, at 0.95 it is the
        # ceiling the adaptive arm should approach
        "teacher_continuous_spec_g2x": (
            continuous, {"p": t_pipe, "assistant": assistant,
                         "synthetic_acceptance": accept,
                         "gamma": 2 * gamma}, {}),
        "teacher_continuous_spec_adaptive": (
            continuous, {"p": t_pipe, "assistant": assistant,
                         "synthetic_acceptance": accept,
                         "adaptive_gamma": True}, {}),
        "teacher_microbatch_spec_adaptive": (
            microbatch, {"p": t_pipe, "assistant": assistant,
                         "synthetic_acceptance": accept,
                         "adaptive_gamma": True}, {}),
        # high-acceptance replays of the three continuous spec arms: the
        # regime where the cost-aware controller SHOULD raise to 2x gamma
        # (and where fixed 2x gamma is the oracle it chases).  Same
        # process -> the gamma-keyed engine programs are already compiled.
        "teacher_continuous_spec_hi": (
            continuous, {"p": t_pipe, "assistant": assistant,
                         "synthetic_acceptance": accept_hi}, {}),
        "teacher_continuous_spec_g2x_hi": (
            continuous, {"p": t_pipe, "assistant": assistant,
                         "synthetic_acceptance": accept_hi,
                         "gamma": 2 * gamma}, {}),
        "teacher_continuous_spec_adaptive_hi": (
            continuous, {"p": t_pipe, "assistant": assistant,
                         "synthetic_acceptance": accept_hi,
                         "adaptive_gamma": True}, {}),
    }
    subset = os.environ.get("BENCH_ARMS")
    if subset:
        keep = set(x.strip() for x in subset.split(","))
        ARMS = {k: v for k, v in ARMS.items() if k in keep}

    results = {}
    for name, (builder, kw, env) in ARMS.items():
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            ts = builder(**kw).start()
            warm = [threading.Thread(target=ts.submit, args=(wav,),
                                     kwargs={"timeout": 900})
                    for _ in range(batch)]
            for t in warm:
                t.start()
            for t in warm:
                t.join()
            print(f"warm {name}", flush=True)
            # Two load rounds per arm: round 1 absorbs any programs that
            # only compile under real traffic (adaptive-gamma rung
            # switches, language-detect, per-budget prefill widths —
            # through the tunnel a single such compile dominates a short
            # wall), round 2 is the steady-state claim.  Both recorded.
            rounds = []
            for r in range(2):
                wall, lat, errors = run_load(ts, wav, clients, per_client,
                                             budgets, rps=0, seed=1 + r)
                n = n_total - len(errors)
                lat = np.asarray(sorted(lat))
                rounds.append({
                    "wall_s": round(wall, 2), "requests": n,
                    "errors": len(errors),
                    "served_audio_s_per_s": round(n * 30.0 / wall, 1),
                    "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
                    "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
                })
            ts.stop()
            results[name] = dict(rounds[1], round1=rounds[0])
            for k in ("drafted", "accepted", "gamma_current",
                      "gamma_raises", "gamma_drops", "ts_fallback"):
                if k in ts.stats:
                    results[name][k] = ts.stats[k]
            print(json.dumps({name: results[name]}), flush=True)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    out = {"preset": "distil-large-v3", "teacher_preset": "large-v3",
           "int8": int8, "batch_size": batch,
           "clients": clients, "per_client": per_client,
           "tokens": [tok_min, max_new], "block_steps": block,
           "gamma": gamma, "synthetic_accept": accept,
           "synthetic_accept_hi": accept_hi,
           "ngram_period": period, "arms": results}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
