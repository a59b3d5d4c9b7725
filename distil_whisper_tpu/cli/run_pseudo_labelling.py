"""Pseudo-labelling: large-batch teacher transcription of a training corpus.

CLI mirror of the reference ``run_pseudo_labelling.py``: speaker-aware 30 s
audio packing with ``condition_on_prev`` tracking (:632-673), batched teacher
``generate`` (data-parallel over the mesh's 'data' axis), incremental CSV
dumps (:887-925), WER-vs-ground-truth reporting, and a saved dataset with the
``whisper_transcript`` column plus <|startofprev|> prompt ids (:971-996).

    python -m distil_whisper_tpu.cli.run_pseudo_labelling \
        --model_checkpoint /ckpts/whisper-large-v3 \
        --dataset_path /data/train --output_dir ./pl_out \
        --language en --per_device_batch_size 32
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
from ..parallel import make_mesh, shard_params, shard_batch
from ..tokenizer import WhisperTokenizer, EnglishTextNormalizer, BasicTextNormalizer
from ..metrics import process_words
from ..training.data import pack_samples, prev_prompt_from_output
from .common import batched, load_dataset_any, logger, setup_logging


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
    p.add_argument("--compute_wer", action="store_true", default=True)
    args = p.parse_args(argv)
    setup_logging()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params, cfg = load_params(args.model_checkpoint, dtype=dtype)
    if dtype == jnp.bfloat16:
        cfg = cfg.replace(fast_bf16_attention=True)
    tok = WhisperTokenizer.from_pretrained(args.model_checkpoint)
    mesh = make_mesh()
    params = shard_params(params, param_axes(cfg), mesh)
    logger.info("mesh: %s", dict(mesh.shape))

    ds = load_dataset_any(args.dataset_path, args.split)
    samples = []
    for row in ds:
        samples.append({
            "audio": load_audio(row[args.audio_column_name],
                                cfg.sampling_rate),
            "text": row.get(args.text_column_name, ""),
            "speaker_id": row.get(args.speaker_id_column_name)
            if args.speaker_id_column_name else None,
        })
    if args.concatenate_audio:
        if args.speaker_id_column_name:
            samples.sort(key=lambda s: (s["speaker_id"] is None,
                                        s["speaker_id"]))
        samples = pack_samples(samples, max_input_samples=cfg.n_samples)
    else:
        for s in samples:
            s["condition_on_prev"] = 0
    logger.info("labelling %d (packed) samples", len(samples))

    prompt = tok.prompt_ids(language=args.language, task=args.task,
                            no_timestamps=not args.return_timestamps)
    opts = GenerationOptions.from_config(
        cfg, max_new_tokens=args.max_new_tokens,
        return_timestamps=args.return_timestamps,
        no_speech_token_id=tok.no_speech)

    bsz = args.per_device_batch_size * mesh.shape["data"]

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
    csv_path = out_dir / "transcriptions.csv"
    csv_f = open(csv_path, "w", newline="")
    csv_w = csv.writer(csv_f)
    csv_w.writerow(["index", "whisper_transcript", "text"])

    # Feature prep runs in a producer thread so mel extraction of batch N+1
    # overlaps generation of batch N (host/device double-buffering — key to
    # the >=500 audio-hrs/hour target).
    from ..training.data_stream import Prefetcher

    def make_feature_batches():
        for group in batched(samples, bsz):
            n = len(group)
            wavs = np.zeros((bsz, cfg.n_samples), np.float32)
            for j, g in enumerate(group):
                w = g["audio"][:cfg.n_samples]
                wavs[j, :len(w)] = w
            mels = np.asarray(compute_mel(jnp.asarray(wavs), cfg))
            yield group, mels

    all_token_ids = []
    audio_seconds = 0.0
    gen_seconds = 0.0
    for step, (group, mels) in enumerate(Prefetcher(make_feature_batches,
                                                    depth=2)):
        n = len(group)
        prompts = jnp.asarray([prompt] * bsz, jnp.int32)
        batch = shard_batch({"mel": jnp.asarray(mels, dtype)}, mesh)
        t0 = time.perf_counter()
        out = gen_fn(params, batch["mel"], prompts)
        seqs = np.asarray(out.sequences)[:n]
        lens = np.asarray(out.seq_len)[:n]
        gen_seconds += time.perf_counter() - t0
        audio_seconds += sum(len(g["audio"]) for g in group) / cfg.sampling_rate

        for j in range(n):
            ids = seqs[j][:lens[j]].tolist()
            all_token_ids.append(ids)
            transcript = tok.decode(ids, skip_special_tokens=False,
                                    decode_with_timestamps=True)
            group[j]["whisper_transcript"] = transcript
            csv_w.writerow([len(all_token_ids) - 1, transcript,
                            group[j]["text"]])
        if (step + 1) % args.logging_steps == 0:
            csv_f.flush()
            logger.info("step %d: %.0f audio-h labelled, %.1f audio-h/h",
                        step + 1, audio_seconds / 3600,
                        audio_seconds / max(gen_seconds, 1e-9))
    csv_f.close()

    # condition_on_prev prompt ids from the previous segment's output
    prev_col = [None]
    for ids, cond in zip(all_token_ids[:-1],
                         [s["condition_on_prev"] for s in samples][1:]):
        prev_col.append(prev_prompt_from_output(tok, ids) if cond else None)

    rows = []
    for s, prev in zip(samples, prev_col):
        rows.append({
            "audio": {"array": s["audio"].tolist(),
                      "sampling_rate": cfg.sampling_rate},
            "text": s["text"],
            "whisper_transcript": s["whisper_transcript"],
            "condition_on_prev": prev,
        })
    import datasets
    out_ds = datasets.Dataset.from_list(rows)
    out_ds.save_to_disk(str(out_dir / "dataset"))

    if args.compute_wer and any(s["text"] for s in samples):
        normalizer = (EnglishTextNormalizer({})
                      if args.language in (None, "en", "english")
                      else BasicTextNormalizer())
        refs, hyps = [], []
        for s in samples:
            if not s["text"]:
                continue
            r = normalizer(s["text"])
            h = normalizer(tok.decode(
                tok.encode_transcript(s["whisper_transcript"])))
            if r.strip():
                refs.append(r)
                hyps.append(h)
        if refs:
            stats = process_words(refs, hyps)
            logger.info("PL WER vs ground truth: %.2f%% (S=%d I=%d D=%d)",
                        100 * stats.wer, stats.substitutions,
                        stats.insertions, stats.deletions)

    rtfx = audio_seconds / max(gen_seconds, 1e-9)
    logger.info("done: %d samples, %.1f audio-h, RTFx %.1f (%.0f audio-h/h)",
                len(samples), audio_seconds / 3600, rtfx, rtfx)
    return str(out_dir / "dataset")


if __name__ == "__main__":
    main()
