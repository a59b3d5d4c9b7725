"""Dynamic-batching transcription server.

Beyond the reference's surface (its user API stops at the Python
``FlaxWhisperPipeline``): serves ``POST /v1/transcribe`` over HTTP with two
schedulers —

* ``--scheduler microbatch`` (default): concurrent single requests are
  drained into one device call of up to ``--batch_size`` 30 s windows
  (``serving.py``), which is how a TPU wants to be fed;
* ``--scheduler continuous``: in-flight batching (``serving_engine.py``) —
  ``--batch_size`` decode lanes run continuously at per-lane cursors, and
  finished lanes are refilled between compiled step-blocks instead of
  waiting for the whole batch (lower latency + higher throughput under
  mixed-length load).

Long files: the microbatch scheduler falls back to the whole-file chunked
pipeline; the continuous scheduler splits them into strided windows that
share lanes with short requests (no head-of-line blocking).

Speculative decoding (``--assistant_checkpoint``, both schedulers): a
distil draft proposes ``--gamma`` tokens per round and the served model
verifies them in one decode — the reference's headline serving speedup
(README.md:352-432), token-identical outputs.  On the continuous
scheduler the accept/verify loop runs PER LANE (each block round advances
every lane by 1..gamma+1 tokens at its own cursor), composing in-flight
batching with draft assistance.

Draft-free variant (``--ngram_speculative``, both schedulers): proposals
come from repeated n-grams in each request's own decoded text (prompt-
lookup decoding) instead of an assistant model — zero extra weights/KV,
same token-identity guarantee.  Wins when speech repeats phrases.

Sampling (``temperature=T&top_k=K&seed=S`` query params): HF ``do_sample``
semantics per request.  The microbatch scheduler groups sampled requests
into shared device calls; the continuous scheduler runs sampled LANES
in-flight next to greedy ones (per-lane temperature/top-k/PRNG key);
a speculative engine serves them on its fallback thread (the accept/verify
contract is argmax agreement).

    python -m distil_whisper_tpu.cli.run_server \
        --model_checkpoint ./distil-large-v3 --port 8000 \
        --scheduler continuous \
        --quantize_encoder --quantize_decoder \
        --quantize_self_kv --quantize_cross_kv

    curl -s -X POST --data-binary @audio.wav \
        'localhost:8000/v1/transcribe?language=en&timestamps=1&max_tokens=64'
"""

from __future__ import annotations

import argparse
import logging

import jax.numpy as jnp

from ..pipeline import WhisperPipeline
from ..serving import BatchingTranscriber, make_http_server
from .common import setup_logging

logger = logging.getLogger("distil_whisper_tpu")


def build_server(argv=None):
    """Parse args, build (http_server, transcriber) — separated from main()
    so tests can bind port 0 and drive the server in-process."""
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_checkpoint", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch_size", type=int, default=8,
                   help="max requests per micro-batch (one device call)")
    p.add_argument("--max_wait_ms", type=float, default=50.0,
                   help="batching window: how long the worker waits to fill "
                        "a batch after the first request arrives "
                        "(microbatch scheduler only)")
    p.add_argument("--scheduler", default="microbatch",
                   choices=["microbatch", "continuous"],
                   help="'microbatch' drains concurrent requests into "
                        "whole-batch generate calls; 'continuous' keeps "
                        "--batch_size decode lanes running and refills "
                        "finished lanes between step-blocks (in-flight "
                        "batching — lower latency under mixed-length load)")
    p.add_argument("--block_steps", type=int, default=16,
                   help="decode steps per compiled engine block "
                        "(continuous scheduler)")
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--assistant_checkpoint", default=None,
                   help="draft checkpoint for speculative decoding "
                        "(reference README.md:352-432): the draft proposes "
                        "--gamma tokens, the served model verifies — output "
                        "is token-identical to plain greedy, typically "
                        "faster.  On the continuous scheduler the "
                        "accept/verify loop runs per lane; timestamped "
                        "requests fall back to plain generate")
    p.add_argument("--gamma", type=int, default=5,
                   help="draft tokens per speculative round")
    p.add_argument("--ngram_speculative", action="store_true",
                   help="prompt-lookup decoding (draft-FREE speculation): "
                        "proposals are copied from repeated n-grams in the "
                        "sequence decoded so far — no assistant checkpoint, "
                        "no draft KV cache, token-identical to greedy.  "
                        "Wins whenever speech repeats phrases (and on "
                        "condition-on-prev prompts).  Both schedulers; on "
                        "the continuous engine the lookup runs per lane")
    p.add_argument("--max_ngram", type=int, default=3,
                   help="longest n-gram to match for --ngram_speculative")
    p.add_argument("--adaptive_gamma", action="store_true",
                   help="walk the draft length over {gamma/2, gamma, "
                        "2*gamma} toward the cost-optimal rung for the "
                        "measured per-draft acceptance (both schedulers; "
                        "token-identical at every gamma — a pure "
                        "throughput knob)")
    p.add_argument("--draft_cost", type=float, default=None,
                   help="draft/teacher per-token decode cost ratio for the "
                        "adaptive-gamma rung picker (default: decoder "
                        "layer-count ratio; 0 for --ngram_speculative)")
    p.add_argument("--max_body_mb", type=float, default=100.0,
                   help="reject request bodies larger than this (413)")
    p.add_argument("--max_queue", type=int, default=None,
                   help="backlog bound (waiting requests / 30 s windows); "
                        "beyond it new requests are shed with 503 + "
                        "Retry-After instead of growing the latency tail "
                        "(default: 8x batch_size)")
    p.add_argument("--language", default=None,
                   help="default language (else per-request/auto-detect)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--quantize_encoder", action="store_true")
    p.add_argument("--quantize_decoder", action="store_true")
    p.add_argument("--quantize_self_kv", action="store_true")
    p.add_argument("--quantize_cross_kv", action="store_true")
    p.add_argument("--quantize_lm_head", action="store_true")
    args = p.parse_args(argv)
    setup_logging()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    from ..models import load_params
    params, cfg = load_params(args.model_checkpoint, dtype=dtype)
    cfg = cfg.replace(
        quantize_encoder=args.quantize_encoder,
        quantize_decoder=args.quantize_decoder,
        quantize_self_kv=args.quantize_self_kv,
        quantize_cross_kv=args.quantize_cross_kv,
        quantize_lm_head=args.quantize_lm_head)
    pipe = WhisperPipeline(args.model_checkpoint, dtype=dtype,
                           batch_size=args.batch_size,
                           max_new_tokens=args.max_new_tokens,
                           params=params, cfg=cfg)
    assistant = None
    if args.ngram_speculative and args.assistant_checkpoint:
        p.error("--ngram_speculative and --assistant_checkpoint are "
                "mutually exclusive (pick one speculation method)")
    if args.assistant_checkpoint:
        from ..parallel import shard_params
        from ..models import param_axes
        draft, draft_cfg = load_params(args.assistant_checkpoint,
                                       dtype=dtype)
        if dtype == jnp.bfloat16:
            draft_cfg = draft_cfg.replace(fast_bf16_attention=True,
                                          use_flash_encoder=True)
        assistant = (shard_params(draft, param_axes(draft_cfg), pipe.mesh),
                     draft_cfg)
    if args.scheduler == "continuous":
        from ..serving_engine import ContinuousTranscriber
        transcriber = ContinuousTranscriber(
            pipe, batch_size=args.batch_size,
            default_language=args.language,
            max_new_tokens=args.max_new_tokens,
            block_steps=args.block_steps,
            max_queue=args.max_queue,
            assistant=assistant, gamma=args.gamma,
            adaptive_gamma=args.adaptive_gamma,
            ngram_speculative=args.ngram_speculative,
            max_ngram=args.max_ngram, draft_cost=args.draft_cost).start()
    else:
        if args.adaptive_gamma and not (assistant or args.ngram_speculative):
            p.error("--adaptive_gamma requires a speculation method "
                    "(--assistant_checkpoint or --ngram_speculative)")
        transcriber = BatchingTranscriber(
            pipe, batch_size=args.batch_size, max_wait_ms=args.max_wait_ms,
            default_language=args.language,
            max_new_tokens=args.max_new_tokens,
            max_queue=args.max_queue,
            assistant=assistant, gamma=args.gamma,
            adaptive_gamma=args.adaptive_gamma,
            ngram_speculative=args.ngram_speculative,
            max_ngram=args.max_ngram, draft_cost=args.draft_cost).start()
    httpd = make_http_server(transcriber, args.host, args.port,
                             max_body_mb=args.max_body_mb)
    return httpd, transcriber


def main(argv=None) -> None:
    httpd, transcriber = build_server(argv)
    host, port = httpd.server_address[:2]
    logger.info("serving on http://%s:%d (POST /v1/transcribe, "
                "GET /healthz, GET /v1/stats); scheduler=%s batch_size=%d "
                "max_queue=%d", host, port, type(transcriber).__name__,
                transcriber.batch_size, transcriber.max_queue)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        transcriber.stop()


if __name__ == "__main__":
    main()
