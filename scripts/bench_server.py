"""Serving throughput: micro-batching vs continuous batching on one chip.

N client threads submit single-window (30 s) requests into the serving
engine behind dwt-serve (HTTP layer bypassed — it adds no device work);
measures served audio-seconds per wall-second and request latency
percentiles.  Env knobs:

  BENCH_SCHEDULER   microbatch | continuous | both (default both)
  BENCH_PRESET      model preset (default distil-large-v3)
  BENCH_BATCH       lanes / max micro-batch (default 16)
  BENCH_CLIENTS     concurrent client threads (default 32)
  BENCH_REQS        requests per client (default 2)
  BENCH_TOKENS      server max_new_tokens budget (default 96)
  BENCH_TOKENS_MIN  per-request random budget floor (default 24) — mixed
                    output lengths are where in-flight batching wins
  BENCH_RPS         mean Poisson arrival rate per client thread, req/s
                    (default 0 = submit immediately)
  BENCH_WORD_TS     fraction of requests asking for word timestamps
                    (default 0) — drives the fallback/alignment path and
                    its micro-batching under mixed load
  BENCH_INT8        1 = full int8 serving stack
  BENCH_BLOCK       continuous-engine steps per block (default 16)
  BENCH_SPEC        1 = speculative serving: a draft model proposes and
                    the served model verifies (both schedulers; on the
                    continuous engine the accept/verify loop runs per
                    lane).  Random weights never agree, so the accept rate
                    is pinned with the synthetic-acceptance oracle — both
                    models run their real compute, token choices are
                    synthetic (same contract as generation.speculative).
  BENCH_DRAFT       draft preset (default distil-large-v3)
  BENCH_ACCEPT      pinned per-draft accept rate (default 0.8)
  BENCH_GAMMA       draft tokens per verify round (default 5)
  BENCH_ADAPTIVE    1 = adaptive draft length (continuous scheduler):
                    walk {gamma/2, gamma, 2*gamma} on measured acceptance
  BENCH_NGRAM       1 = draft-free prompt-lookup speculation (exclusive
                    with BENCH_SPEC).  On the continuous scheduler a
                    BENCH_PERIOD-R teacher oracle (default 24) makes each
                    lane's text repeat — the lookup ceiling; the
                    microbatch lane runs raw random-weight behavior
  DWT_INLINE_ADMISSION=1  revert admission featurisation (mel + language
                    detect) onto the step-loop thread — the pre-overlap
                    behavior; A/B against the default producer-thread
                    overlap to measure the p95 win under admission churn

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_server.py
"""

import json
import os
import threading
import time

import numpy as np


def run_load(ts, wav, clients, per_client, budgets, rps, seed=1,
             word_ts_mask=None):
    """Drive the transcriber with `clients` threads; returns latencies."""
    errors, lat = [], []
    lock = threading.Lock()
    rng = np.random.default_rng(seed)

    def client(ci):
        waits = (rng.exponential(1.0 / rps, per_client) if rps > 0
                 else np.zeros(per_client))
        for k in range(per_client):
            time.sleep(waits[k])
            i = ci * per_client + k
            kw = {}
            if word_ts_mask is not None and word_ts_mask[i]:
                kw["return_timestamps"] = "word"
            t0 = time.perf_counter()
            try:
                ts.submit(wav, timeout=600,
                          max_new_tokens=int(budgets[i]), **kw)
                dt = time.perf_counter() - t0
                with lock:
                    lat.append(dt)
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(str(e)[:100])

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.perf_counter() - t0, lat, errors


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.pipeline import WhisperPipeline
    from distil_whisper_tpu.serving import BatchingTranscriber
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    from distil_whisper_tpu.tokenizer import WhisperTokenizer

    preset = os.environ.get("BENCH_PRESET", "distil-large-v3")
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    clients = int(os.environ.get("BENCH_CLIENTS", "32"))
    per_client = int(os.environ.get("BENCH_REQS", "2"))
    max_new = int(os.environ.get("BENCH_TOKENS", "96"))
    tok_min = int(os.environ.get("BENCH_TOKENS_MIN", "24"))
    rps = float(os.environ.get("BENCH_RPS", "0"))
    word_ts_frac = float(os.environ.get("BENCH_WORD_TS", "0"))
    int8 = os.environ.get("BENCH_INT8") == "1"
    block = int(os.environ.get("BENCH_BLOCK", "16"))
    which = os.environ.get("BENCH_SCHEDULER", "both")
    spec = os.environ.get("BENCH_SPEC") == "1"
    draft_preset = os.environ.get("BENCH_DRAFT", "distil-large-v3")
    accept = float(os.environ.get("BENCH_ACCEPT", "0.8"))
    gamma = int(os.environ.get("BENCH_GAMMA", "5"))
    adaptive = os.environ.get("BENCH_ADAPTIVE") == "1"
    # BENCH_LANG=auto leaves language unset so every admission pays the
    # language-detect device fetch -- the cost the featurizer-thread
    # overlap hides (A/B with DWT_INLINE_ADMISSION=1)
    lang = os.environ.get("BENCH_LANG", "en")
    lang = None if lang in ("auto", "") else lang
    # draft-free prompt-lookup speculation; BENCH_PERIOD pins a period-R
    # teacher oracle (repeating text — the lookup ceiling)
    ngram = os.environ.get("BENCH_NGRAM") == "1"
    period = int(os.environ.get("BENCH_PERIOD", "24")) if ngram else None
    assert not (ngram and spec), "BENCH_NGRAM and BENCH_SPEC are exclusive"

    cfg = PRESETS[preset].replace(
        fast_bf16_attention=True, use_flash_encoder=True,
        quantize_encoder=int8, quantize_decoder=int8,
        quantize_self_kv=int8, quantize_cross_kv=int8,
        quantize_lm_head=int8)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    assistant = None
    if spec:
        d_cfg = PRESETS[draft_preset].replace(
            fast_bf16_attention=True, use_flash_encoder=True)
        assistant = (init_params(d_cfg, jax.random.PRNGKey(3),
                                 dtype=jnp.bfloat16), d_cfg)

    # tokenizer: tiny synthetic artifacts (zero-egress) — build in /tmp
    import tests.helpers as H  # noqa: E402  (repo-root PYTHONPATH)
    ck = "/tmp/bench_server_tok"
    if not os.path.isdir(ck):
        H.make_tiny_checkpoint(ck)
    tok = WhisperTokenizer.from_pretrained(ck)

    pipe = WhisperPipeline(ck, dtype=jnp.bfloat16, batch_size=batch,
                           max_new_tokens=max_new, params=params, cfg=cfg,
                           tokenizer=tok)

    # per-request budgets: mixed output lengths (random weights never emit
    # EOS, so the budget IS the output length — a realistic length mix)
    rng = np.random.default_rng(7)
    n_total = clients * per_client
    budgets = rng.integers(tok_min, max_new + 1, n_total)
    word_ts_mask = (rng.random(n_total) < word_ts_frac
                    if word_ts_frac > 0 else None)
    wav = (0.05 * rng.standard_normal(cfg.n_samples)).astype(np.float32)

    results = {}
    for name in (["microbatch", "continuous"] if which == "both"
                 else [which]):
        if name == "continuous":
            # max_queue: the bench measures saturation throughput, so
            # admit the whole offered load (no 503 shedding mid-bench)
            ts = ContinuousTranscriber(pipe, batch_size=batch,
                                       default_language=lang,
                                       max_new_tokens=max_new,
                                       block_steps=block,
                                       max_queue=10**9,
                                       assistant=assistant, gamma=gamma,
                                       adaptive_gamma=adaptive,
                                       ngram_speculative=ngram,
                                       synthetic_period=period,
                                       synthetic_acceptance=(
                                           accept if spec else None)).start()
        else:
            ts = BatchingTranscriber(pipe, batch_size=batch,
                                     max_wait_ms=100,
                                     default_language=lang,
                                     max_new_tokens=max_new,
                                     max_queue=10**9,
                                     assistant=assistant, gamma=gamma,
                                     ngram_speculative=ngram,
                                     synthetic_acceptance=(
                                         accept if spec else None)).start()
        # warmup: compile (full batch for microbatch; admit buckets + step
        # for continuous)
        warm = [threading.Thread(target=ts.submit, args=(wav,),
                                 kwargs={"timeout": 900})
                for _ in range(batch)]
        for t in warm:
            t.start()
        for t in warm:
            t.join()
        if word_ts_mask is not None:
            # compile the alignment-pass program outside the timed window
            ts.submit(wav, timeout=900, return_timestamps="word")
        print(f"warm {name}", flush=True)

        wall, lat, errors = run_load(ts, wav, clients, per_client, budgets,
                                     rps, word_ts_mask=word_ts_mask)
        ts.stop()
        n = n_total - len(errors)
        lat = np.asarray(sorted(lat))
        results[name] = {
            "wall_s": round(wall, 2), "requests": n, "errors": len(errors),
            "served_audio_s_per_s": round(n * 30.0 / wall, 1),
            "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
            "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
            "stats": dict(ts.stats),
        }
        print(json.dumps({name: results[name]}), flush=True)

    out = {"preset": preset, "int8": int8, "batch_size": batch,
           "clients": clients, "per_client": per_client,
           "tokens": [tok_min, max_new], "rps_per_client": rps,
           "word_ts_frac": word_ts_frac,
           **({"speculative": {"draft": draft_preset, "gamma": gamma,
                               "adaptive": adaptive,
                               "synthetic_accept": accept}} if spec else {}),
           **results}
    if len(results) == 2:
        out["continuous_vs_microbatch"] = round(
            results["continuous"]["served_audio_s_per_s"]
            / max(results["microbatch"]["served_audio_s_per_s"], 1e-9), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
