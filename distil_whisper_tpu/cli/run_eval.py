"""Evaluation harness: four inference modes + WER / RTFx / hallucination.

CLI mirror of the reference ``run_eval.py`` (modes documented at
training/README.md:327-346):

* ``short``       — batched 30 s greedy generate
* ``sequential``  — OpenAI-style long-form with temperature fallback
  (auto-selected when any input exceeds 30 s, reference :726-735)
* ``chunked``     — strided-chunk pipeline with timestamp/LCS merge
* ``speculative`` — draft-assisted decoding (``--assistant_checkpoint``)

Metrics: WER (+I/S/D splits), RTFx = audio-time / transcription-time
(reference :894), tokens/s, and for long-form the hallucination stats
IER/SER/DER + repeated 5-grams (flax/run_long_form_transcription.py:524-550).

    python -m distil_whisper_tpu.cli.run_eval \
        --model_checkpoint ./distil-large-v3 --dataset_path ./test_set \
        --mode short --language en
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.io import load_audio
from ..audio import compute_mel
from ..generation import (GenerationOptions, encode_and_generate,
                          SequentialOptions, SequentialTranscriber,
                          speculative_generate_batched)
from ..models import load_params, param_axes
from ..models.whisper import encode, cross_kv
from ..ops.quant import maybe_quantize_encoder
from ..parallel import (make_mesh, shard_params, data_sharding,
                        maybe_initialize_distributed)
from ..tokenizer import (WhisperTokenizer, EnglishTextNormalizer,
                         BasicTextNormalizer)
from ..metrics import process_words, count_repeated_ngrams
from ..pipeline import WhisperPipeline
from .common import (add_noise_at_snr, batched, load_dataset_any, logger,
                     setup_logging)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_checkpoint", required=True)
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--split", default=None)
    p.add_argument("--mode", default="short",
                   choices=["short", "sequential", "chunked", "speculative"])
    p.add_argument("--assistant_checkpoint", default=None)
    p.add_argument("--language", default=None)
    p.add_argument("--task", default="transcribe")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--chunk_length_s", type=float, default=25.0)
    p.add_argument("--return_timestamps", action="store_true")
    # sequential long-form knobs (reference run_eval.py:147-176; defaults =
    # the published eval defaults, BASELINE.md)
    p.add_argument("--temperature_fallback",
                   default="0.0,0.2,0.4,0.6,0.8,1.0",
                   help="comma-separated fallback temperature ladder")
    p.add_argument("--logprob_threshold", type=float, default=-1.0)
    p.add_argument("--no_speech_threshold", type=float, default=0.6)
    p.add_argument("--compression_ratio_threshold", type=float, default=1.35)
    p.add_argument("--condition_on_prev", action="store_true",
                   help="condition each window on the previous output")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--output_json", default=None)
    p.add_argument("--gamma", type=int, default=5,
                   help="draft tokens per speculative round")
    p.add_argument("--speculative_method", default="draft",
                   choices=["draft", "ngram"],
                   help="draft = assistant-model proposals (reference "
                        "semantics, needs --assistant_checkpoint); ngram = "
                        "prompt-lookup decoding (draft-FREE: proposals are "
                        "copied from repeated n-grams in the sequence so "
                        "far — no assistant model, no extra memory)")
    p.add_argument("--max_ngram", type=int, default=3,
                   help="longest n-gram to match for --speculative_method "
                        "ngram (tried max..1, longest match wins)")
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--noise_snr_db", type=float, default=None,
                   help="mix white noise at this SNR (noise evaluation)")
    p.add_argument("--quantize_cross_kv", action="store_true",
                   help="int8 cross-attention K/V (halves per-token HBM "
                        "traffic on long decodes; validate WER first)")
    p.add_argument("--quantize_encoder", action="store_true",
                   help="W8A8 int8 encoder matmuls (int8 MXU path, ~2x bf16 "
                        "peak on v5e; validate WER first)")
    p.add_argument("--quantize_decoder", action="store_true",
                   help="W8A8 int8 decoder projections (halves the weight-"
                        "read floor of low-batch decode; validate WER first)")
    p.add_argument("--quantize_self_kv", action="store_true",
                   help="int8 decoder self-attention cache (validate WER "
                        "first)")
    p.add_argument("--quantize_lm_head", action="store_true",
                   help="int8 logits matmul against an int8 copy of the "
                        "tied embedding (validate WER first)")
    p.add_argument("--precise_tok_per_s", action="store_true",
                   help="fixed-token benchmark on dummy encoder outputs "
                        "(decouples tokens/s from WER)")
    p.add_argument("--prompt_text", default=None,
                   help="condition generation on this text via "
                        "<|startofprev|> prompt ids (reference "
                        "run_eval.py:709-710 / HF get_prompt_ids)")
    p.add_argument("--distributed", action="store_true",
                   help="fail fast unless jax.distributed comes up multi-process (use on pods/orchestrators where auto-detection is unreliable)")
    from .common import parse_args_with_json
    return parse_args_with_json(p, argv)


def seq_options_from_args(args) -> SequentialOptions:
    """CLI flags -> SequentialOptions (reference flag set,
    training/run_eval.py:147-176)."""
    return SequentialOptions(
        temperatures=tuple(float(t) for t in
                           args.temperature_fallback.split(",")),
        logprob_threshold=args.logprob_threshold,
        no_speech_threshold=args.no_speech_threshold,
        compression_ratio_threshold=args.compression_ratio_threshold,
        condition_on_prev_tokens=args.condition_on_prev,
        max_new_tokens=args.max_new_tokens,
        num_beams=args.num_beams)


def main(argv=None):
    args = parse_args(argv)
    from .common import apply_platform_env
    apply_platform_env()
    setup_logging()
    maybe_initialize_distributed(force=args.distributed)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    params, cfg = load_params(args.model_checkpoint, dtype=dtype)
    if dtype == jnp.bfloat16:
        cfg = cfg.replace(fast_bf16_attention=True, use_flash_encoder=True)
    if args.quantize_cross_kv:
        cfg = cfg.replace(quantize_cross_kv=True)
    if args.quantize_self_kv:
        cfg = cfg.replace(quantize_self_kv=True)
    if args.quantize_encoder:
        cfg = cfg.replace(quantize_encoder=True)
    if args.quantize_decoder:
        cfg = cfg.replace(quantize_decoder=True)
    if args.quantize_lm_head:
        cfg = cfg.replace(quantize_lm_head=True)
    tok = WhisperTokenizer.from_pretrained(args.model_checkpoint)
    # Evaluation is embarrassingly parallel across hosts: each process runs
    # an independent mesh over its own devices on its slice of the dataset
    # (the reference's accelerate pattern); error COUNTS are summed over
    # hosts at the end so every host logs identical aggregate metrics.
    n_proc = jax.process_count()
    mesh = (make_mesh(devices=jax.local_devices()) if n_proc > 1
            else make_mesh())
    params = shard_params(params, param_axes(cfg), mesh)
    params = maybe_quantize_encoder(params, cfg)
    n_data = mesh.shape["data"]
    if args.batch_size % n_data:
        args.batch_size = -(-args.batch_size // n_data) * n_data
        logger.info("batch_size rounded up to %d (multiple of the %d-way "
                    "'data' axis)", args.batch_size, n_data)
    normalizer = (EnglishTextNormalizer(tok.spelling_mapping)
                  if args.language in (None, "en", "english")
                  else BasicTextNormalizer())

    ds = load_dataset_any(args.dataset_path, args.split)
    if n_proc > 1 and hasattr(ds, "shard"):
        ds = ds.shard(num_shards=n_proc, index=jax.process_index(),
                      contiguous=True)
    audios, texts = [], []
    noise_rng = np.random.default_rng(0)
    for row in ds:
        a = load_audio(row["audio"], cfg.sampling_rate)
        if args.noise_snr_db is not None:
            a = add_noise_at_snr(a, args.noise_snr_db, noise_rng)
        audios.append(a)
        texts.append(row.get("text", ""))
    audio_seconds = sum(len(a) for a in audios) / cfg.sampling_rate
    # Auto-enable sequential long-form when any input exceeds one 30 s window
    # (reference run_eval.py:726-735 switches gen_kwargs the same way).
    if args.mode == "short" and any(len(a) > cfg.n_samples for a in audios):
        logger.info("inputs exceed 30 s: auto-enabling sequential long-form")
        args.mode = "sequential"
    logger.info("%d samples, %.1f audio-s, mode=%s", len(audios),
                audio_seconds, args.mode)

    if args.precise_tok_per_s:
        # fixed-token generation against random encoder states
        # (reference run_eval.py:274-294, 806-844)
        from ..generation import generate as gen_fn
        opts = GenerationOptions.from_config(
            cfg, max_new_tokens=args.max_new_tokens,
            min_new_tokens=args.max_new_tokens)
        rng0 = np.random.default_rng(0)
        enc = jnp.asarray(rng0.standard_normal(
            (args.batch_size, cfg.max_source_positions, cfg.d_model)), dtype)
        prompt = jnp.full((args.batch_size, 1),
                          cfg.decoder_start_token_id, jnp.int32)

        @jax.jit
        def fixed(params, enc, prompt):
            cross = cross_kv(params["decoder"], cfg, enc)
            return gen_fn(params["decoder"], cfg, cross, prompt, opts,
                          dtype=dtype)
        out = fixed(params, enc, prompt)          # compile
        np.asarray(out.seq_len)
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = fixed(params, enc, prompt)
            np.asarray(out.seq_len)
        dt = (time.perf_counter() - t0) / iters
        toks = args.batch_size * args.max_new_tokens
        result = {"mode": "precise_tok_per_s",
                  "tokens_per_second": round(toks / dt, 2),
                  "batch_size": args.batch_size,
                  "tokens": args.max_new_tokens}
        print(json.dumps(result))
        return result

    t0 = time.perf_counter()
    n_tokens = 0
    hyps = []

    if args.mode == "short":
        prompt = tok.prompt_ids(language=args.language, task=args.task,
                                no_timestamps=not args.return_timestamps)
        if args.prompt_text:
            # HF get_prompt_ids layout: <|startofprev|> + " "+text tokens,
            # prefixed to the task prompt (reference run_eval.py:709-710)
            prompt = ([tok.sot_prev]
                      + tok.encode(" " + args.prompt_text.strip())
                      + list(prompt))
        opts = GenerationOptions.from_config(
            cfg, max_new_tokens=args.max_new_tokens,
            return_timestamps=args.return_timestamps,
            no_speech_token_id=tok.no_speech)

        if args.num_beams > 1:
            from ..generation import encode_and_beam_search

            @jax.jit
            def gen(params, mel, prompts):
                return encode_and_beam_search(params, cfg, mel, prompts, opts,
                                              num_beams=args.num_beams,
                                              dtype=dtype)
        else:
            @jax.jit
            def gen(params, mel, prompts):
                return encode_and_generate(params, cfg, mel, prompts, opts,
                                           dtype=dtype)
        # Per-sample language detection when no --language is given and the
        # model is multilingual (the reference's pipeline does this; the
        # harness previously required the language up front).
        detect = None
        if args.language is None and len(tok.lang_to_id) > 1:
            from ..models.whisper import decode as dec_fn, init_cache

            @jax.jit
            def detect(params, mel):
                enc_s = encode(params["encoder"], cfg, mel, dtype=dtype)
                cross = cross_kv(params["decoder"], cfg, enc_s)
                cache = init_cache(cfg, mel.shape[0], dtype=dtype)
                sot = jnp.full((mel.shape[0], 1),
                               cfg.decoder_start_token_id, jnp.int32)
                logits, _ = dec_fn(params["decoder"], cfg, sot, cross=cross,
                                   cache=cache, pos_offset=0, dtype=dtype)
                return logits[:, 0]
            lang_ids = np.asarray(sorted(tok.lang_to_id.values()))
            # token accounting below subtracts the prompt length; with a
            # detected language every prompt has the same (lang-bearing) length
            prompt = tok.prompt_ids(
                language=next(iter(tok.lang_to_id)), task=args.task,
                no_timestamps=not args.return_timestamps)
            if args.prompt_text:
                prompt = ([tok.sot_prev]
                          + tok.encode(" " + args.prompt_text.strip())
                          + list(prompt))

        for group in batched(list(zip(audios, texts)), args.batch_size):
            n = len(group)
            # pad the ragged final batch at the WAV stage so the mel stays on
            # device (no [B,128,3000] round-trip through the host)
            wavs = np.zeros((args.batch_size, cfg.n_samples), np.float32)
            for j, (a, _) in enumerate(group):
                w = a[:cfg.n_samples]
                wavs[j, :len(w)] = w
            mels = compute_mel(jnp.asarray(wavs), cfg).astype(dtype)
            if detect is not None:
                logits = np.asarray(detect(params, mels))
                best = lang_ids[np.argmax(logits[:, lang_ids], axis=-1)]
                prefix = ([tok.sot_prev]
                          + tok.encode(" " + args.prompt_text.strip())
                          if args.prompt_text else [])
                prompts = jnp.asarray(
                    [prefix
                     + tok.prompt_ids(language=tok.id_to_lang[int(i)],
                                      task=args.task,
                                      no_timestamps=not args.return_timestamps)
                     for i in best], jnp.int32)
            else:
                prompts = jnp.asarray([prompt] * args.batch_size, jnp.int32)
            mel_dev = jax.device_put(mels, data_sharding(mesh, 3))
            out = gen(params, mel_dev, prompts)
            seqs, lens = np.asarray(out.sequences)[:n], np.asarray(out.seq_len)[:n]
            for j in range(n):
                ids = seqs[j][:lens[j]].tolist()
                n_tokens += max(len(ids) - len(prompt), 0)
                # slice the prompt off before decoding: --prompt_text tokens
                # are ordinary text tokens and must not leak into the
                # hypothesis (decode skips specials, not prompt text)
                hyps.append(tok.decode(ids[len(prompt):]))

    elif args.mode == "sequential":
        # Speculation composes with the sequential ladder (t=0 rung only):
        # opt in with --assistant_checkpoint (draft) or
        # --speculative_method ngram (draft-free prompt lookup — with
        # --condition_on_prev the prompt embeds the previous window's text,
        # the ideal n-gram source).
        spec_method, spec_assistant = None, None
        if args.speculative_method == "ngram":
            if args.assistant_checkpoint:
                raise ValueError(
                    "--speculative_method ngram is draft-free; drop "
                    "--assistant_checkpoint (or use --speculative_method "
                    "draft to use it)")
            spec_method = "ngram"
        elif args.assistant_checkpoint:
            spec_method = "draft"
            d_params, d_cfg = load_params(args.assistant_checkpoint,
                                          dtype=dtype)
            d_params = shard_params(d_params, param_axes(d_cfg), mesh)
            spec_assistant = (d_params, d_cfg)
        tr = SequentialTranscriber(
            params, cfg, tok, seq_options_from_args(args),
            language=args.language, task=args.task,
            batch_size=args.batch_size, dtype=dtype,
            speculative_method=spec_method, assistant=spec_assistant,
            gamma=args.gamma, max_ngram=args.max_ngram)
        feats = [np.asarray(compute_mel(
            jnp.asarray(a), cfg, pad_to_chunk=False)[0]) for a in audios]
        init_prompt = None
        if args.prompt_text:
            if not args.condition_on_prev:
                raise SystemExit("--prompt_text in sequential mode requires "
                                 "--condition_on_prev (the prompt layout "
                                 "reserves the context budget only then)")
            init_prompt = tok.encode(" " + args.prompt_text.strip())
        results = tr.transcribe(feats, initial_prompt_tokens=init_prompt)
        for r in results:
            hyps.append(r["text"])
            n_tokens += sum(len(s["tokens"]) for s in r["segments"])
        if tr.spec_stats["drafted"]:
            logger.info("sequential speculative acceptance rate: %.1f%% "
                        "(%d rounds)",
                        100 * tr.spec_stats["accepted"]
                        / tr.spec_stats["drafted"], tr.spec_stats["rounds"])

    elif args.mode == "chunked":
        # speculation opt-in mirrors sequential mode: --assistant_checkpoint
        # (draft) or --speculative_method ngram (draft-free)
        spec_method, spec_assistant = None, None
        if args.speculative_method == "ngram":
            if args.assistant_checkpoint:
                raise ValueError(
                    "--speculative_method ngram is draft-free; drop "
                    "--assistant_checkpoint (or use --speculative_method "
                    "draft to use it)")
            spec_method = "ngram"
        elif args.assistant_checkpoint:
            spec_method = "draft"
            d_params, d_cfg = load_params(args.assistant_checkpoint,
                                          dtype=dtype)
            d_params = shard_params(d_params, param_axes(d_cfg), mesh)
            spec_assistant = (d_params, d_cfg)
        # mesh= keeps chunked mode on the host-local mesh under
        # multi-process runs (the pipeline would otherwise build a global
        # one and device_put to non-addressable devices)
        pipe = WhisperPipeline(args.model_checkpoint, dtype=dtype,
                               batch_size=args.batch_size,
                               max_new_tokens=args.max_new_tokens,
                               params=params, cfg=cfg, tokenizer=tok,
                               mesh=mesh, speculative_method=spec_method,
                               assistant=spec_assistant, gamma=args.gamma,
                               max_ngram=args.max_ngram)
        gk = {"num_beams": args.num_beams} if args.num_beams > 1 else None
        for a in audios:
            out = pipe(a, chunk_length_s=args.chunk_length_s,
                       language=args.language, task=args.task,
                       return_timestamps=True, generate_kwargs=gk)
            hyps.append(out["text"])
        if pipe.spec_stats["drafted"]:
            logger.info("chunked speculative acceptance rate: %.1f%%",
                        100 * pipe.spec_stats["accepted"]
                        / pipe.spec_stats["drafted"])

    elif args.mode == "speculative":
        prompt = tok.prompt_ids(language=args.language, task=args.task)
        opts = GenerationOptions.from_config(
            cfg, max_new_tokens=args.max_new_tokens)

        if args.speculative_method == "ngram":
            if args.assistant_checkpoint:
                raise ValueError(
                    "--speculative_method ngram is draft-free; drop "
                    "--assistant_checkpoint (or use --speculative_method "
                    "draft to use it)")
            # prompt-lookup decoding: no assistant model at all — drafts
            # are copied from repeated n-grams in the decoded sequence
            from ..generation.speculative import (
                ngram_speculative_generate_batched)

            @jax.jit
            def spec(t_params, mel, prompt_ids):
                enc = encode(t_params["encoder"], cfg, mel, dtype=dtype)
                t_cross = cross_kv(t_params["decoder"], cfg, enc)
                return ngram_speculative_generate_batched(
                    t_params["decoder"], cfg, t_cross, prompt_ids, opts,
                    gamma=args.gamma, max_ngram=args.max_ngram, dtype=dtype)

            run_spec = lambda mel, prompt_arr: spec(params, mel, prompt_arr)
        else:
            assert args.assistant_checkpoint, "--assistant_checkpoint required"
            draft, draft_cfg = load_params(args.assistant_checkpoint,
                                           dtype=dtype)
            draft = shard_params(draft, param_axes(draft_cfg), mesh)

            @jax.jit
            def spec(t_params, d_params, mel, prompt_ids):
                enc = encode(t_params["encoder"], cfg, mel, dtype=dtype)
                t_cross = cross_kv(t_params["decoder"], cfg, enc)
                # distil drafts share the teacher encoder (reference :585-599)
                d_enc = (enc if draft_cfg.d_model == cfg.d_model
                         else encode(d_params["encoder"], draft_cfg, mel,
                                     dtype=dtype))
                d_cross = cross_kv(d_params["decoder"], draft_cfg, d_enc)
                return speculative_generate_batched(
                    t_params["decoder"], cfg, d_params["decoder"], draft_cfg,
                    t_cross, d_cross, prompt_ids, opts, gamma=args.gamma,
                    dtype=dtype)

            run_spec = lambda mel, prompt_arr: spec(params, draft, mel,
                                                    prompt_arr)

        # lanes share weights and diverge in cursors (vmap of the bs-1
        # loop), so --batch_size amortises the weight-read floor; the
        # reference's speculative mode is batch-1-only (run_eval.py:578).
        bs = max(1, args.batch_size)
        prompt_arr = jnp.tile(jnp.asarray([prompt], jnp.int32), (bs, 1))
        accepted = drafted = 0
        for start in range(0, len(audios), bs):
            group = audios[start:start + bs]
            # mels stay ON DEVICE ([1, n_mels, 3000] each): fetching them to
            # host and re-uploading costs ~35 MB of tunnel traffic per
            # bs-16 group (the round-1 pitfall, docs/PERFORMANCE.md)
            mels = [compute_mel(jnp.asarray(a), cfg) for a in group]
            while len(mels) < bs:          # pad the ragged last group
                mels.append(mels[-1])
            mel = jnp.concatenate(mels, axis=0).astype(dtype)
            out = run_spec(mel, prompt_arr)
            seqs = np.asarray(out.sequences)
            lens = np.asarray(out.seq_len)
            for i in range(len(group)):
                ids = seqs[i][:int(lens[i])].tolist()
                n_tokens += max(len(ids) - len(prompt), 0)
                hyps.append(tok.decode(ids))
            accepted += int(np.sum(np.asarray(out.accepted)[:len(group)]))
            drafted += int(np.sum(np.asarray(out.drafted)[:len(group)]))
        if drafted:
            logger.info("speculative acceptance rate: %.1f%%",
                        100 * accepted / drafted)

    wall = time.perf_counter() - t0
    rtfx = audio_seconds / wall

    result = {"mode": args.mode, "num_samples": len(audios),
              "audio_seconds": round(audio_seconds, 2),
              "transcription_seconds": round(wall, 2),
              "rtfx": round(rtfx, 2),
              "tokens_per_second": round(n_tokens / wall, 2)}

    from ..metrics.wer import WordErrors
    refs_n = [normalizer(t) for t in texts]
    hyps_n = [normalizer(h) for h in hyps]
    pairs = [(r, h) for r, h in zip(refs_n, hyps_n) if r.strip()]
    stats = (process_words([r for r, _ in pairs], [h for _, h in pairs])
             if pairs else WordErrors())
    rep5 = sum(count_repeated_ngrams(h, 5) for h in hyps_n)
    if n_proc > 1:
        # sum error counts over the per-host dataset shards.  EVERY host
        # participates — a host whose shard has no usable references must
        # still enter the collective or the others hang — and the
        # repeated-5-gram count rides the same vector so all hosts report
        # identical aggregates.
        from jax.experimental import multihost_utils
        counts = multihost_utils.process_allgather(np.asarray(
            [stats.hits, stats.substitutions, stats.insertions,
             stats.deletions, stats.num_ref_words, rep5], np.int64))
        h, s, i, d, nw, rep5 = counts.reshape(-1, 6).sum(axis=0).tolist()
        stats = WordErrors(hits=h, substitutions=s, insertions=i,
                           deletions=d, num_ref_words=nw)
    if stats.num_ref_words:
        result.update({
            "wer": round(100 * stats.wer, 4),
            "ier": round(100 * stats.ier, 4),
            "ser": round(100 * stats.ser, 4),
            "der": round(100 * stats.der, 4),
            "repeated_5grams": rep5,
        })

    logger.info("results: %s", json.dumps(result))
    print(json.dumps(result))
    if args.output_json:
        out_path = Path(args.output_json)
        if n_proc > 1:
            # per-process file (predictions are host-local; concurrent
            # writes to one path on a shared FS would corrupt it)
            out_path = out_path.with_name(
                f"{out_path.stem}-{jax.process_index()}{out_path.suffix}")
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with open(out_path, "w") as f:
            json.dump({**result, "predictions": hyps, "references": texts},
                      f, indent=2)
    return result


if __name__ == "__main__":
    main()
