"""Serving throughput: the dynamic-batching engine on one chip.

N client threads submit single-window (30 s) requests concurrently into
``serving.BatchingTranscriber`` (the engine behind dwt-serve, HTTP layer
bypassed — it adds no device work); measures served audio-seconds per
wall-second and the batching behaviour.  BENCH_INT8=1 turns on the full
int8 serving stack.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_server.py
"""

import json
import os
import threading
import time

import numpy as np


def main():
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.pipeline import WhisperPipeline
    from distil_whisper_tpu.serving import BatchingTranscriber
    from distil_whisper_tpu.tokenizer import WhisperTokenizer

    preset = os.environ.get("BENCH_PRESET", "distil-large-v3")
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    clients = int(os.environ.get("BENCH_CLIENTS", "32"))
    per_client = int(os.environ.get("BENCH_REQS", "2"))
    max_new = int(os.environ.get("BENCH_TOKENS", "96"))
    int8 = os.environ.get("BENCH_INT8") == "1"

    import jax
    cfg = PRESETS[preset].replace(
        fast_bf16_attention=True, use_flash_encoder=True,
        quantize_encoder=int8, quantize_decoder=int8,
        quantize_self_kv=int8, quantize_cross_kv=int8,
        quantize_lm_head=int8)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    # tokenizer: tiny synthetic artifacts (zero-egress) — build in /tmp
    import tests.helpers as H  # noqa: E402  (repo-root PYTHONPATH)
    ck = "/tmp/bench_server_tok"
    if not os.path.isdir(ck):
        H.make_tiny_checkpoint(ck)
    tok = WhisperTokenizer.from_pretrained(ck)

    pipe = WhisperPipeline(ck, dtype=jnp.bfloat16, batch_size=batch,
                           max_new_tokens=max_new, params=params, cfg=cfg,
                           tokenizer=tok)
    ts = BatchingTranscriber(pipe, batch_size=batch, max_wait_ms=100,
                             default_language="en",
                             max_new_tokens=max_new).start()

    rng = np.random.default_rng(0)
    wav = (0.05 * rng.standard_normal(cfg.n_samples)).astype(np.float32)

    # warmup: one full batch (compile)
    warm = [threading.Thread(target=ts.submit, args=(wav,))
            for _ in range(batch)]
    for t in warm:
        t.start()
    for t in warm:
        t.join()
    print("warm", flush=True)

    errors = []

    def client():
        for _ in range(per_client):
            try:
                ts.submit(wav, timeout=600)
            except Exception as e:  # noqa: BLE001
                errors.append(str(e)[:100])

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    ts.stop()

    n = clients * per_client - len(errors)
    audio_s = n * 30.0
    print(json.dumps({
        "preset": preset, "int8": int8, "batch_size": batch,
        "clients": clients, "requests": n, "errors": len(errors),
        "wall_s": round(wall, 2),
        "served_audio_s_per_s": round(audio_s / wall, 1),
        "rtfx_served": round(audio_s / wall, 1),
        "stats": dict(ts.stats),
    }))


if __name__ == "__main__":
    main()
