"""Pseudo-labelling: large-batch teacher transcription of a training corpus.

CLI mirror of the reference ``run_pseudo_labelling.py``: speaker-aware 30 s
audio packing with ``condition_on_prev`` tracking (:632-673), batched teacher
``generate`` (data-parallel over the mesh's 'data' axis), incremental CSV
dumps (:887-925), WER-vs-ground-truth reporting, and a saved dataset with the
``whisper_transcript`` column plus <|startofprev|> prompt ids (:971-996).

Scales to the 22k-hour corpora the recipe targets: the corpus STREAMS —
rows are loaded/packed lazily, mel extraction overlaps generation via a
producer thread, and the output dataset is written incrementally through an
Arrow writer (nothing is materialised in RAM).

    python -m distil_whisper_tpu.cli.run_pseudo_labelling \
        --model_checkpoint /ckpts/whisper-large-v3 \
        --dataset_path /data/train --output_dir ./pl_out \
        --language en --per_device_batch_size 64
"""

from __future__ import annotations

import argparse
import csv
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.io import load_audio
from ..audio import compute_mel
from ..generation import GenerationOptions, encode_and_generate
from ..models import load_params, param_axes
from ..ops.quant import maybe_quantize_encoder
from ..parallel import (make_mesh, shard_params, data_sharding,
                        maybe_initialize_distributed)
from ..tokenizer import WhisperTokenizer, EnglishTextNormalizer, BasicTextNormalizer
from ..metrics import process_words
from ..metrics.wer import WordErrors
from ..training.data import pack_samples_iter, prev_prompt_from_output
from .common import load_dataset_any, logger, setup_logging


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_checkpoint", required=True)
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--split", default=None)
    p.add_argument("--per_device_batch_size", type=int, default=16)
    p.add_argument("--language", default=None)
    p.add_argument("--task", default="transcribe")
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--return_timestamps", action="store_true", default=True)
    p.add_argument("--no_timestamps", dest="return_timestamps",
                   action="store_false")
    p.add_argument("--concatenate_audio", action="store_true", default=True)
    p.add_argument("--no_concatenate_audio", dest="concatenate_audio",
                   action="store_false")
    p.add_argument("--audio_column_name", default="audio")
    p.add_argument("--text_column_name", default="text")
    p.add_argument("--speaker_id_column_name", default=None)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--compute_wer", action="store_true", default=False,
                   help="WER of the pseudo-labels vs the text column. The "
                        "reference computes this for val/test splits only "
                        "(run_pseudo_labelling.py:930-952); it is pure-host "
                        "work (normalise + align per sample) that competes "
                        "with feature prep for the GIL, so keep it off for "
                        "train-split labelling throughput")
    p.add_argument("--quantize_cross_kv", action="store_true",
                   help="int8 cross-attention K/V for the 256-token decode")
    p.add_argument("--quantize_encoder", action="store_true",
                   help="W8A8 int8 encoder matmuls (int8 MXU path; validate "
                        "WER first)")
    p.add_argument("--quantize_decoder", action="store_true",
                   help="W8A8 int8 decoder projections (validate WER first)")
    p.add_argument("--quantize_self_kv", action="store_true",
                   help="int8 decoder self-attention cache (validate WER "
                        "first)")
    p.add_argument("--quantize_lm_head", action="store_true",
                   help="int8 logits matmul against an int8 copy of the "
                        "tied embedding (validate WER first)")
    p.add_argument("--distributed", action="store_true",
                   help="fail fast unless jax.distributed comes up multi-process (use on pods/orchestrators where auto-detection is unreliable)")
    p.add_argument("--publish_dir", default=None,
                   help="mirror artifacts (CSV flushes, final dataset) into "
                        "this directory as the run progresses — the "
                        "local/NFS analogue of the reference's incremental "
                        "Hub pushes (run_pseudo_labelling.py:887-925)")
    p.add_argument("--push_to_hub", default=None, metavar="REPO_ID",
                   help="push incremental CSVs + the final labelled dataset "
                        "to this Hub dataset repo (reference "
                        "run_pseudo_labelling.py:887-925, 1015-1018; needs "
                        "network egress)")
    p.add_argument("--hub_token", default=None)
    p.add_argument("--featurizer_workers", type=int, default=0,
                   help="N subprocess featurizer workers (audio load + 30 s "
                        "packing + int16 conversion escape the GIL; the "
                        "dataset is contiguously sharded per worker, so "
                        "condition-on-prev chains break only at worker "
                        "boundaries — the reference dataloader num_workers "
                        "role, run_pseudo_labelling.py:751-790).  0 = "
                        "in-process producer thread")
    args = p.parse_args(argv)
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
    # Labelling is embarrassingly parallel across hosts: each process runs an
    # INDEPENDENT mesh over its own devices and labels its contiguous dataset
    # shard (the reference's accelerate/DDP pattern,
    # run_pseudo_labelling.py:859-898) — no cross-host collectives in the hot
    # loop; only the final WER counts are allgathered.  A global mesh here
    # would require assembling global batches and fetching non-addressable
    # outputs every step for zero benefit.
    mesh = (make_mesh(devices=jax.local_devices())
            if jax.process_count() > 1 else make_mesh())
    params = shard_params(params, param_axes(cfg), mesh)
    params = maybe_quantize_encoder(params, cfg)
    logger.info("mesh: %s (%d processes)", dict(mesh.shape),
                jax.process_count())

    ds = load_dataset_any(args.dataset_path, args.split)
    if hasattr(ds, "with_format"):
        # Arrow -> numpy zero-copy for the audio column; the default python
        # formatting materialises every waveform as a LIST of floats
        # (tens of ms per 30 s sample — a host bottleneck at bs32+ now that
        # generate itself runs ~2.4x faster than round 1)
        ds = ds.with_format("numpy", columns=[args.audio_column_name],
                            output_all_columns=True)
    if args.concatenate_audio and args.speaker_id_column_name \
            and hasattr(ds, "sort"):
        ds = ds.sort(args.speaker_id_column_name)  # Arrow-backed, O(1) RAM
    n_proc = jax.process_count()
    if n_proc > 1 and hasattr(ds, "shard"):
        # contiguous shards keep same-speaker runs (and condition-on-prev
        # chains) within one process
        ds = ds.shard(num_shards=n_proc, index=jax.process_index(),
                      contiguous=True)

    def raw_rows():
        for row in ds:
            yield {
                "audio": load_audio(row[args.audio_column_name],
                                    cfg.sampling_rate),
                "text": row.get(args.text_column_name, ""),
                "speaker_id": row.get(args.speaker_id_column_name)
                if args.speaker_id_column_name else None,
            }

    if args.concatenate_audio:
        sample_iter = pack_samples_iter(raw_rows(),
                                        max_input_samples=cfg.n_samples)
    else:
        def sample_iter_fn():
            for s in raw_rows():
                s["condition_on_prev"] = 0
                yield s
        sample_iter = sample_iter_fn()

    prompt = tok.prompt_ids(language=args.language, task=args.task,
                            no_timestamps=not args.return_timestamps)
    opts = GenerationOptions.from_config(
        cfg, max_new_tokens=args.max_new_tokens,
        return_timestamps=args.return_timestamps,
        no_speech_token_id=tok.no_speech)

    # per-host batch: the mesh is host-local when n_proc > 1 (above)
    local_bsz = max(args.per_device_batch_size * mesh.shape["data"], 1)

    if args.num_beams > 1:
        from ..generation import encode_and_beam_search

        @jax.jit
        def gen_fn(params, mel, prompts):
            return encode_and_beam_search(params, cfg, mel, prompts, opts,
                                          num_beams=args.num_beams,
                                          dtype=dtype)
    else:
        @jax.jit
        def gen_fn(params, mel, prompts):
            return encode_and_generate(params, cfg, mel, prompts, opts,
                                       dtype=dtype)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    suffix = f"-{jax.process_index()}" if n_proc > 1 else ""
    csv_path = out_dir / f"transcriptions{suffix}.csv"
    csv_f = open(csv_path, "w", newline="")
    csv_w = csv.writer(csv_f)
    csv_w.writerow(["index", "whisper_transcript", "text"])

    # Incremental artifact publishing (reference pushes CSVs to the Hub
    # every logging_steps and the dataset at the end —
    # run_pseudo_labelling.py:887-925, 1015-1018).  Each process publishes
    # only its own suffix-named shard files, so multi-host runs need no
    # coordination.
    from ..utils.publish import make_publisher
    publisher = make_publisher(publish_dir=args.publish_dir,
                               push_to_hub=args.push_to_hub,
                               hub_token=args.hub_token)

    # Incremental Arrow output: every labelled row goes straight to disk
    # (the reference materialises and save_to_disk's at the end —
    # run_pseudo_labelling.py:971-1018 — which caps corpus size at RAM).
    import datasets
    from datasets.arrow_writer import ArrowWriter
    features = datasets.Features({
        "audio": {"array": datasets.Sequence(datasets.Value("float32")),
                  "sampling_rate": datasets.Value("int32")},
        "text": datasets.Value("string"),
        "whisper_transcript": datasets.Value("string"),
        "condition_on_prev": datasets.Sequence(datasets.Value("int32")),
    })
    # one shard per process; the shard dir is itself a load_from_disk-able
    # Dataset (state.json/dataset_info.json written around the arrow file,
    # no second copy of the audio)
    ds_dir = out_dir / ("dataset" if n_proc == 1
                        else f"dataset-{jax.process_index()}")
    ds_dir.mkdir(parents=True, exist_ok=True)
    arrow_path = ds_dir / "data-00000-of-00001.arrow"
    writer = ArrowWriter(features=features, path=str(arrow_path))

    # Feature prep runs in a producer thread so audio load + packing + mel
    # extraction of batch N+1 overlap generation of batch N.
    from ..training.data_stream import Prefetcher

    def make_feature_batches():
        if args.featurizer_workers > 0:
            # N subprocess featurizers produce int16 batches; this (producer-
            # thread) side keeps only the device work: upload + mel.
            from ..training.pl_workers import worker_feature_batches
            spec = dict(dataset_path=args.dataset_path, split=args.split,
                        audio_col=args.audio_column_name,
                        text_col=args.text_column_name,
                        speaker_col=args.speaker_id_column_name,
                        concatenate=args.concatenate_audio,
                        sampling_rate=cfg.sampling_rate,
                        n_samples=cfg.n_samples, local_bsz=local_bsz,
                        host_shard=(jax.process_index(), n_proc))
            for item in worker_feature_batches(spec, args.featurizer_workers):
                group = [{
                    # int16 round-trips 16-bit-source audio bit-exactly
                    "audio": (item["wav16"][j, :item["lens"][j]]
                              .astype(np.float32) / 32768.0),
                    "text": item["texts"][j],
                    "condition_on_prev": item["cond"][j],
                    "worker": item["worker"],
                } for j in range(item["n"])]
                dev = jnp.asarray(item["wav16"]).astype(jnp.float32) / 32768.0
                yield group, compute_mel(dev, cfg).astype(dtype)
            return
        group = []
        for s in sample_iter:
            group.append(s)
            if len(group) < local_bsz:
                continue
            yield _featurize(group)
            group = []
        if group:
            yield _featurize(group)

    def _featurize(group):
        wavs = np.zeros((local_bsz, cfg.n_samples), np.float32)
        for j, g in enumerate(group):
            w = g["audio"][:cfg.n_samples]
            wavs[j, :len(w)] = w
        # Upload PCM as int16 (audio is 16-bit at source; halves transfer)
        # and keep the mel ON DEVICE — round-tripping the [B,128,3000] mel
        # through the host cost ~35 MB/batch of tunnel traffic, the dominant
        # PL overhead vs the raw generate rate.
        wav16 = np.clip(np.round(wavs * 32768.0), -32768, 32767
                        ).astype(np.int16)
        dev = jnp.asarray(wav16).astype(jnp.float32) / 32768.0
        return group, compute_mel(dev, cfg).astype(dtype)

    mel_sharding = data_sharding(mesh, 3)
    normalizer = (EnglishTextNormalizer({})
                  if args.language in (None, "en", "english")
                  else BasicTextNormalizer())
    wer_stats = WordErrors()
    n_samples = 0
    audio_seconds = 0.0
    gen_seconds = 0.0
    # previous row's generated ids, keyed by featurizer-worker stream (rows
    # from different worker shards interleave batch-to-batch; each worker's
    # own rows stay in order, so the condition-on-prev chain is per stream)
    prev_ids: dict = {}

    last_consume_end = {"t": None}
    rated_audio_s = 0.0   # audio counted toward the steady-state rate

    def consume(group, out, n, batch_audio_s):
        """Fetch + decode + write one finished batch (runs while the NEXT
        batch is already generating on device).  The steady-state rate is
        measured consume-to-consume — i.e. max(device, host) per batch —
        with the first batch (compilation) excluded."""
        nonlocal n_samples, prev_ids, wer_stats, gen_seconds, rated_audio_s
        seqs = np.asarray(out.sequences)[:n]   # blocks until the batch is done
        lens = np.asarray(out.seq_len)[:n]
        now = time.perf_counter()
        if last_consume_end["t"] is not None:
            gen_seconds += now - last_consume_end["t"]
            rated_audio_s += batch_audio_s
        last_consume_end["t"] = now
        for j in range(n):
            ids = seqs[j][:lens[j]].tolist()
            transcript = tok.decode(ids, skip_special_tokens=False,
                                    decode_with_timestamps=True)
            s = group[j]
            wid = s.get("worker", 0)
            prev = (prev_prompt_from_output(tok, prev_ids[wid])
                    if s.get("condition_on_prev") and wid in prev_ids
                    else None)
            writer.write({
                "audio": {"array": s["audio"],
                          "sampling_rate": cfg.sampling_rate},
                "text": s["text"],
                "whisper_transcript": transcript,
                "condition_on_prev": prev,
            })
            csv_w.writerow([n_samples, transcript, s["text"]])
            n_samples += 1
            prev_ids[wid] = ids
            if args.compute_wer and s["text"]:
                r = normalizer(s["text"])
                h = normalizer(tok.decode(tok.encode_transcript(transcript)))
                if r.strip():
                    wer_stats = wer_stats + process_words([r], [h])

    # Double-buffered device loop: dispatch generate for batch N+1 (async),
    # THEN consume batch N's outputs — host decode/normalise/Arrow-write is
    # fully hidden behind device time.
    prompts = jnp.asarray([prompt] * local_bsz, jnp.int32)
    pending = None
    t_loop = time.perf_counter()
    for step, (group, mels) in enumerate(Prefetcher(make_feature_batches,
                                                    depth=2)):
        n = len(group)
        # mels is already a device array; device_put only (re)shards it
        mel_dev = jax.device_put(mels, mel_sharding)
        out = gen_fn(params, mel_dev, prompts)   # async dispatch
        batch_audio_s = sum(len(g["audio"]) for g in group) / cfg.sampling_rate
        audio_seconds += batch_audio_s
        if pending is not None:
            consume(*pending)
        pending = (group, out, n, batch_audio_s)
        del mels
        if (step + 1) % args.logging_steps == 0:
            csv_f.flush()
            if publisher is not None:
                publisher.publish(out_dir, [csv_path],
                                  f"PL flush at step {step + 1} "
                                  f"({audio_seconds / 3600:.2f} audio-h)")
            wall_rate = audio_seconds / max(
                time.perf_counter() - t_loop, 1e-9)
            logger.info("step %d: %.2f audio-h labelled, %.0f audio-h/h "
                        "(incl. first-batch compile)", step + 1,
                        audio_seconds / 3600, wall_rate)
    if pending is not None:
        consume(*pending)
    csv_f.close()
    writer.finalize()
    writer.close()
    # register the shard in-place as a datasets.Dataset directory
    import json as _json
    out_ds = datasets.Dataset.from_file(str(arrow_path))
    with open(ds_dir / "state.json", "w") as f:
        _json.dump({"_data_files": [{"filename": arrow_path.name}],
                    "_fingerprint": out_ds._fingerprint,
                    "_format_columns": None, "_format_kwargs": {},
                    "_format_type": None, "_output_all_columns": False,
                    "_split": None}, f)
    out_ds.info.write_to_directory(str(ds_dir))
    del out_ds
    if publisher is not None:
        publisher.finalize(out_dir, f"PL complete: {n_samples} samples, "
                                    f"{audio_seconds / 3600:.2f} audio-h")

    if args.compute_wer:
        if n_proc > 1:  # sum error counts over the per-host shards
            from jax.experimental import multihost_utils
            counts = multihost_utils.process_allgather(np.asarray(
                [wer_stats.hits, wer_stats.substitutions,
                 wer_stats.insertions, wer_stats.deletions,
                 wer_stats.num_ref_words], np.int64))
            h, s, i, d, nw = counts.reshape(-1, 5).sum(axis=0).tolist()
            wer_stats = WordErrors(hits=h, substitutions=s, insertions=i,
                                   deletions=d, num_ref_words=nw)
        if wer_stats.num_ref_words:
            logger.info("PL WER vs ground truth: %.2f%% (S=%d I=%d D=%d)",
                        100 * wer_stats.wer, wer_stats.substitutions,
                        wer_stats.insertions, wer_stats.deletions)

    rtfx = rated_audio_s / max(gen_seconds, 1e-9)
    logger.info("done: %d samples, %.1f audio-h, RTFx %.1f (%.0f audio-h/h "
                "steady-state, first compile excluded)",
                n_samples, audio_seconds / 3600, rtfx, rtfx)
    return str(ds_dir)


if __name__ == "__main__":
    main()
