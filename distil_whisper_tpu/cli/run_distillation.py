"""Knowledge distillation trainer (pseudo-labelled data -> distil student).

CLI mirror of the reference ``run_distillation.py`` (torch) /
``flax/run_distillation.py`` (TPU): WER-threshold filtering of pseudo-labels,
timestamp/condition-on-prev label sampling, 0.8*CE + kl_weight*T^2*KL
(+ mse_weight hidden-state MSE), shared frozen encoder, mixed-precision
GSPMD training over a ('data','model') mesh, eval WER via jitted generate,
step checkpoints with rotation + best-by-val-WER, final HF-format export.

    python -m distil_whisper_tpu.cli.run_distillation \
        --teacher_checkpoint /ckpts/whisper-large-v3 \
        --student_checkpoint ./distil-init \
        --train_dataset_path ./pl_out/dataset --output_dir ./distil-run \
        --max_steps 80000 --per_device_train_batch_size 64
"""

from __future__ import annotations

import argparse
import json
import signal
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.io import load_audio
from ..audio import compute_mel
from ..generation import GenerationOptions, encode_and_generate
from ..models import load_params, param_axes, save_pretrained
from ..models.params import to_fp32
from ..parallel import (make_mesh, shard_params, shardings_for_tree,
                        DEFAULT_RULES, RULES_2D,
                        maybe_initialize_distributed,
                        host_local_batch_to_global, gather_rows,
                        process_local_slice, global_row_positions)
from ..tokenizer import (WhisperTokenizer, EnglishTextNormalizer,
                         BasicTextNormalizer)
from ..metrics import process_words
from ..training import (Collator, DistillConfig, OptimizerConfig, TrainState,
                        build_train_step, CheckpointManager, is_wer_in_range,
                        prepare_labels, make_optimizer, place_state)
from ..utils.profiling import MetricsLogger
from .common import (load_dataset_any, load_multiple_datasets, logger,
                     setup_logging, copy_tokenizer_files)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--teacher_checkpoint", required=True)
    p.add_argument("--student_checkpoint", required=True)
    p.add_argument("--train_dataset_path", required=True,
                   help="dataset path, or `+`-delimited list to interleave")
    p.add_argument("--train_splits", default=None)
    p.add_argument("--dataset_probabilities", default=None)
    p.add_argument("--min_duration_s", type=float, default=0.0)
    p.add_argument("--max_duration_s", type=float, default=30.0)
    p.add_argument("--streaming", action="store_true",
                   help="lazy per-sample prep + shuffle buffer + background "
                        "prefetch instead of materialising the dataset")
    p.add_argument("--shuffle_buffer_size", type=int, default=256)
    p.add_argument("--eval_dataset_path", default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--per_device_train_batch_size", type=int, default=8)
    p.add_argument("--per_device_eval_batch_size", type=int, default=8)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--lr_scheduler_type", default="constant_with_warmup")
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--precision", default="half_mixed",
                   choices=["full", "half_mixed", "full_mixed"])
    p.add_argument("--wer_threshold", type=float, default=10.0)
    p.add_argument("--use_pseudo_labels", action="store_true", default=True)
    p.add_argument("--no_pseudo_labels", dest="use_pseudo_labels",
                   action="store_false")
    p.add_argument("--timestamp_probability", type=float, default=0.2)
    p.add_argument("--condition_on_prev_probability", type=float, default=0.2)
    p.add_argument("--round_timestamps", action="store_true",
                   help="round timestamp labels to 0.1 s (reference "
                        "flax/run_distillation.py:1376-1386)")
    p.add_argument("--max_label_length", type=int, default=448)
    p.add_argument("--freeze_encoder", action="store_true", default=True)
    p.add_argument("--train_encoder", dest="freeze_encoder",
                   action="store_false")
    p.add_argument("--freeze_decoder", action="store_true",
                   help="freeze the decoder except the tied embeddings/LM "
                        "head (reference run_distillation.py:1027-1032)")
    p.add_argument("--freeze_embed_positions", action="store_true",
                   help="freeze decoder position embeddings (reference "
                        "run_distillation.py:1034-1040)")
    p.add_argument("--preprocessing_only", action="store_true",
                   help="prepare + cache the training set, then exit (two-"
                        "phase pattern, reference run_distillation.py:263-275)")
    p.add_argument("--preprocessed_cache", default=None,
                   help="directory for the prepared-sample cache (written by "
                        "--preprocessing_only, reused on the training run)")
    p.add_argument("--param_sharding", default="1d", choices=["1d", "2d"],
                   help="1d: params sharded over 'model' only; 2d: FSDP-style "
                        "over 'data' too (optimizer moments follow params)")
    p.add_argument("--ce_weight", type=float, default=0.8)
    p.add_argument("--kl_weight", type=float, default=1.0)
    p.add_argument("--mse_weight", type=float, default=0.0)
    p.add_argument("--temperature", type=float, default=2.0)
    p.add_argument("--language", default=None)
    p.add_argument("--task", default="transcribe")
    p.add_argument("--eval_steps", type=int, default=500)
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--save_total_limit", type=int, default=1)
    p.add_argument("--save_best_total_limit", type=int, default=1,
                   help="how many best-by-val-WER checkpoints to keep "
                        "(reference run_distillation.py:714-726)")
    p.add_argument("--logging_steps", type=int, default=25)
    p.add_argument("--report_to", default="jsonl",
                   help="comma list of metrics sinks: jsonl (default), "
                        "tensorboard (event files when importable), wandb "
                        "(env-gated via WANDB_PROJECT) — mirrors the "
                        "reference's --report_to "
                        "(flax/run_distillation.py:764-816)")
    p.add_argument("--tensorboard_dir", default=None,
                   help="TB event-file dir (default <output_dir>/tb)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace of this many steps "
                        "(starting 2 steps after the first, past compile); "
                        "view with tensorboard/xprof")
    p.add_argument("--profile_dir", default=None,
                   help="trace output dir (default <output_dir>/trace)")
    p.add_argument("--distributed", action="store_true",
                   help="fail fast unless jax.distributed comes up multi-process (use on pods/orchestrators where auto-detection is unreliable)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--resume_from_checkpoint", action="store_true")
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--eval_max_new_tokens", type=int, default=128)
    p.add_argument("--teacher_precision", default="train",
                   choices=["train", "inference", "int8"],
                   help="Numerics for the TEACHER side of the step, which is "
                        "pure inference (frozen shared encoder + no-grad "
                        "teacher decode): 'train' = the fp32-island training "
                        "policy (default, exact); 'inference' = the validated "
                        "bf16 fast-attention + fused-Pallas-encoder stack; "
                        "'int8' = inference + W8A8 int8 teacher projections "
                        "(ops/quant.py).  Student GRADIENT numerics are "
                        "exact, but note: under the default shared frozen "
                        "encoder the student also trains on the approximate "
                        "teacher's encoder states — a train/serve feature "
                        "skew if the student serves with an exact bf16 "
                        "encoder (its magnitude is the int8 stack's bounded "
                        "drift, tests/test_quant.py; it vanishes if serving "
                        "uses --quantize_encoder too)")
    p.add_argument("--quantize_student", default="none",
                   choices=["none", "weights", "w8a8"],
                   help="Quantization-aware training for the STUDENT "
                        "(ops/qat.py): fake-quantize its decoder "
                        "projections/MLP in the forward with straight-"
                        "through gradients, so the trained weights serve "
                        "faithfully under --quantize_decoder int8 "
                        "inference.  'w8a8' (weights + dynamic per-token "
                        "activation fake-quant) is THE serve-matching mode "
                        "- the int8 stack always quantizes activations "
                        "dynamically; 'weights' (weight fake-quant only) "
                        "is an ablation knob, not a serving target.  An "
                        "unfrozen student encoder (--train_encoder) is "
                        "included too.")
    p.add_argument("--loss_chunk_size", type=int, default=0,
                   help="chunked CE+KL: never materialise the [B,S,V] "
                        "student+teacher logits pair (~4 GB at bs16/seq256 "
                        "for large-v3); 0 = off, 128 recommended on 16 GB "
                        "chips. Identical math.")
    return p.parse_args(argv)


def _prepare_row(row, tok, cfg, args, normalizer, rng):
    """One raw row -> training sample (or None when filtered)."""
    text_col = "whisper_transcript" if args.use_pseudo_labels else "text"
    transcript = row.get(text_col)
    if args.use_pseudo_labels and args.wer_threshold is not None:
        if not is_wer_in_range(row.get("text", ""), transcript,
                               normalizer, args.wer_threshold):
            return None
    audio = load_audio(row["audio"], cfg.sampling_rate)
    if not (args.min_duration_s * cfg.sampling_rate < len(audio)
            <= args.max_duration_s * cfg.sampling_rate):
        return None
    prev = row.get("condition_on_prev")
    labels = prepare_labels(
        tok, transcript, is_pseudo_label=args.use_pseudo_labels,
        language=args.language, task=args.task,
        prev_ids=list(prev)[1:] if prev else None,
        timestamp_probability=args.timestamp_probability,
        condition_on_prev_probability=args.condition_on_prev_probability,
        max_label_length=args.max_label_length,
        round_timestamps=getattr(args, "round_timestamps", False), rng=rng)
    if not (1 < len(labels) < args.max_label_length):
        return None
    mel = np.asarray(compute_mel(jnp.asarray(audio), cfg)[0])
    return {"input_features": mel, "labels": labels,
            "text": row.get("text", "")}


def _prepare_samples(ds, tok, cfg, args, normalizer, rng):
    """Filter + label-prepare + feature-extract (host side)."""
    samples = []
    n_filtered = 0
    for row in ds:
        s = _prepare_row(row, tok, cfg, args, normalizer, rng)
        if s is None:
            n_filtered += 1
        else:
            samples.append(s)
    logger.info("prepared %d samples (%d filtered)", len(samples), n_filtered)
    return samples


def main(argv=None):
    args = parse_args(argv)
    setup_logging()
    maybe_initialize_distributed(force=args.distributed)
    rng = np.random.default_rng(args.seed)

    teacher, teacher_cfg = load_params(args.teacher_checkpoint)
    student, student_cfg = load_params(args.student_checkpoint)
    tok = WhisperTokenizer.from_pretrained(args.teacher_checkpoint)
    normalizer = (EnglishTextNormalizer(tok.spelling_mapping)
                  if args.language in (None, "en", "english")
                  else BasicTextNormalizer())

    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev // args.model_parallel, args.model_parallel))
    rules = RULES_2D if args.param_sharding == "2d" else DEFAULT_RULES
    logger.info("mesh: %s (%d processes, %s param sharding)",
                dict(mesh.shape), jax.process_count(), args.param_sharding)
    teacher = shard_params(teacher, param_axes(teacher_cfg), mesh, rules)
    student = shard_params(student, param_axes(student_cfg), mesh, rules)

    if args.teacher_precision != "train":
        # The teacher side of a distillation step is INFERENCE (frozen shared
        # encoder + stop-gradient decode), so it can ride the same fast paths
        # the serving stack uses; the student keeps exact training numerics.
        # flash encoder only under bf16 compute (mirrors the inference
        # drivers); fast_bf16_attention is exact for fp32 inputs
        teacher_cfg = teacher_cfg.replace(
            fast_bf16_attention=True,
            use_flash_encoder=(args.precision != "full"))
        if args.teacher_precision == "int8":
            from ..ops.quant import quantize_teacher_params
            teacher = quantize_teacher_params(teacher)

    frozen = []
    if args.freeze_encoder:
        frozen.append("encoder")
    if args.quantize_student != "none" and args.freeze_decoder:
        # fake-quantizing a decoder that never updates is just PTQ with
        # extra steps — the STE gradients have nowhere to go
        logger.warning("--quantize_student with --freeze_decoder: the frozen "
                    "decoder cannot adapt to the quantized numerics; this "
                    "is equivalent to serving-time PTQ (--quantize_decoder)")
    if args.freeze_decoder:
        # everything under decoder EXCEPT tok_emb (tied to the LM head,
        # reference run_distillation.py:1027-1032)
        frozen += ["decoder.pos_emb", "decoder.layers", "decoder.ln"]
    elif args.freeze_embed_positions:
        frozen.append("decoder.pos_emb")
    opt_cfg = OptimizerConfig(
        learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
        total_steps=args.max_steps, schedule=args.lr_scheduler_type,
        weight_decay=args.weight_decay, max_grad_norm=args.max_grad_norm,
        b1=args.adam_beta1, b2=args.adam_beta2, eps=args.adam_epsilon,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        precision=args.precision, frozen_prefixes=tuple(frozen))
    tx = make_optimizer(opt_cfg, to_fp32(student))
    state, tx = TrainState.create(student, opt_cfg, tx)
    s_shardings = shardings_for_tree(param_axes(student_cfg), mesh, rules)
    state = place_state(state, tx, mesh, s_shardings)

    dcfg = DistillConfig(
        ce_weight=args.ce_weight, kl_weight=args.kl_weight,
        temperature=args.temperature, mse_weight=args.mse_weight,
        freeze_encoder=args.freeze_encoder,
        share_encoder=args.freeze_encoder,
        remat=args.gradient_checkpointing,
        loss_chunk_size=args.loss_chunk_size,
        quantize_student=args.quantize_student)
    train_step, eval_step = build_train_step(student_cfg, teacher_cfg, dcfg,
                                             opt_cfg, tx)
    jit_train = jax.jit(train_step, donate_argnums=(0,))
    jit_eval = jax.jit(eval_step)


    def ckpt_view(st):
        # single-process: host numpy (simple, sync).  Multi-process: pass the
        # global jax.Arrays themselves — orbax coordinates a sharded
        # multi-host save/restore (every process participates); a per-process
        # device_get would raise on non-addressable shards (2-D sharding)
        # and racing host-side writes would corrupt a shared filesystem.
        return (st if jax.process_count() > 1
                else jax.device_get(st))
    mgr = CheckpointManager(args.output_dir,
                            save_total_limit=args.save_total_limit,
                            best_total_limit=args.save_best_total_limit)
    start_step = 0
    if args.resume_from_checkpoint:
        resumed = mgr.resume_latest(ckpt_view(state))
        if resumed is not None:
            start_step, state = resumed
            state = place_state(state, tx, mesh, s_shardings)
            logger.info("resumed from step %d", start_step)

    train_ds = load_multiple_datasets(args.train_dataset_path,
                                      args.train_splits,
                                      args.dataset_probabilities,
                                      seed=args.seed)
    # Mask prompts with the TOKENIZER's <|startoftranscript|> — labels are
    # built from the tokenizer, and a checkpoint config with mismatched ids
    # would silently mask every label otherwise.
    if tok.sot != teacher_cfg.decoder_start_token_id:
        logger.warning(
            "config decoder_start_token_id=%d != tokenizer <|startoftranscript|>"
            "=%d; using the tokenizer's id for prompt masking",
            teacher_cfg.decoder_start_token_id, tok.sot)
    collator = Collator(decoder_start_token_id=tok.sot,
                        pad_token_id=teacher_cfg.pad_token_id,
                        max_target_length=args.max_label_length)
    # Each process feeds its own slice of the global batch; GSPMD assembles
    # the global arrays (host_local_batch_to_global).  Single-process this is
    # a plain device_put — same code path, no special-casing.
    n_proc = jax.process_count()
    global_bsz = args.per_device_train_batch_size * mesh.shape["data"]
    local_bsz = max(global_bsz // n_proc, 1)

    samples = None
    stream = None
    cache_file = (Path(args.preprocessed_cache) / "train_samples.npy"
                  if args.preprocessed_cache else None)
    if args.streaming:
        if args.preprocessing_only:
            raise ValueError("--preprocessing_only is incompatible with "
                             "--streaming: preparation happens on the fly "
                             "(reference run_distillation.py:1308-1313)")
        from ..training.data_stream import streaming_batches
        if n_proc > 1:
            if hasattr(train_ds, "shard"):
                # each host streams a disjoint contiguous shard — distinct
                # shuffle seeds alone would feed every host the full corpus
                train_ds = train_ds.shard(num_shards=n_proc,
                                          index=jax.process_index(),
                                          contiguous=True)
            else:
                logger.warning(
                    "streaming multi-host: dataset has no shard(); hosts "
                    "will draw independently-shuffled copies of the corpus")
        stream = streaming_batches(
            train_ds,
            prepare=lambda row: _prepare_row(row, tok, teacher_cfg, args,
                                             normalizer, rng),
            collate=collator, batch_size=local_bsz,
            shuffle_buffer_size=args.shuffle_buffer_size,
            seed=args.seed + jax.process_index(), repeat=True,
            prefetch_depth=2)
    else:
        prep_sharded = False
        if (cache_file is not None and cache_file.exists()
                and not args.preprocessing_only):
            samples = list(np.load(cache_file, allow_pickle=True))
            logger.info("loaded %d prepared samples from %s",
                        len(samples), cache_file)
        else:
            prep_ds = train_ds
            if (n_proc > 1 and not args.preprocessing_only
                    and hasattr(train_ds, "shard")):
                # shard BEFORE preparation: audio load + mel + WER filter is
                # the dominant startup cost and each host only needs its
                # 1/n_proc (the train loop cycles, so unequal per-host
                # counts after filtering are fine)
                prep_ds = train_ds.shard(num_shards=n_proc,
                                         index=jax.process_index(),
                                         contiguous=True)
                prep_sharded = True
            samples = _prepare_samples(prep_ds, tok, teacher_cfg, args,
                                       normalizer, rng)
            if not samples:
                raise RuntimeError("no training samples after filtering")
            if cache_file is not None:
                cache_file.parent.mkdir(parents=True, exist_ok=True)
                np.save(cache_file, np.asarray(samples, dtype=object),
                        allow_pickle=True)
                logger.info("cached %d prepared samples at %s",
                            len(samples), cache_file)
        if args.preprocessing_only:
            logger.info("--preprocessing_only set: preprocessing finished, "
                        "skipping training")
            return str(cache_file) if cache_file else None
        if n_proc > 1 and not prep_sharded:
            samples = samples[process_local_slice(len(samples))]
    eval_samples = None
    if args.eval_dataset_path:
        eval_ds = load_dataset_any(args.eval_dataset_path, "validation")
        eval_args = argparse.Namespace(**{**vars(args),
                                          "use_pseudo_labels": False,
                                          "wer_threshold": None,
                                          "condition_on_prev_probability": 0.0,
                                          "timestamp_probability": 0.0})
        eval_samples = _prepare_samples(eval_ds, tok, teacher_cfg, eval_args,
                                        normalizer, rng)
        if n_proc > 1 and eval_samples:
            # each host evaluates its own slice; run_eval() allgathers the
            # I/S/D counts — without this every host would feed the SAME
            # rows and the summed counts would be n_proc-fold inflated.
            # NB: eval must prepare the FULL set on every host and slice to
            # EQUAL sizes (unlike the sharded train prep): the eval loop
            # runs collectives per batch, so all hosts need identical
            # iteration counts.
            eval_samples = eval_samples[process_local_slice(
                len(eval_samples))]

    # Preemption robustness (SURVEY.md §5 flags this as a reference gap):
    # SIGTERM/SIGINT request a checkpoint at the next step boundary, so a
    # preempted TPU slice resumes with --resume_from_checkpoint.
    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        logger.warning("signal %d received: checkpointing at next step "
                       "boundary, then exiting", signum)
        stop_requested["flag"] = True

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _request_stop)
        except ValueError:
            pass  # not the main thread (e.g. under a test runner)

    order = rng.permutation(len(samples)) if samples else None
    cursor = 0
    best_wer = float("inf")
    t_start = time.perf_counter()
    # JSONL scalar sink + per-eval prediction tables — the reference's W&B
    # scalars and prediction tables (training/run_distillation.py:501-537)
    # without a network dependency.
    metrics_log = MetricsLogger(
        str(Path(args.output_dir) / "metrics.jsonl"),
        report_to=tuple(s.strip() for s in args.report_to.split(",")),
        tensorboard_dir=args.tensorboard_dir,
        run_name=Path(args.output_dir).name)

    def next_batch():
        nonlocal order, cursor
        if stream is not None:
            return next(stream)
        idx = []
        while len(idx) < local_bsz:
            if cursor >= len(order):
                order = rng.permutation(len(samples))
                cursor = 0
            idx.append(order[cursor])
            cursor += 1
        return collator([samples[i] for i in idx])

    def run_eval(step):
        nonlocal best_wer
        if not eval_samples:
            return
        opts = GenerationOptions.from_config(
            student_cfg, max_new_tokens=args.eval_max_new_tokens)
        prompt = tok.prompt_ids(language=args.language, task=args.task)

        @jax.jit
        def gen_fn(params, mel, prompts):
            return encode_and_generate(params, student_cfg, mel, prompts,
                                       opts, dtype=opt_cfg.compute_dtype)
        local_ebsz = max(
            args.per_device_eval_batch_size * mesh.shape["data"] // n_proc, 1)
        # where THIS host's rows land in the global batch — measured, not
        # assumed process-contiguous (mesh device order may be reordered
        # for ICI locality on pod topologies)
        rowpos = global_row_positions(mesh, local_ebsz)
        refs, hyps, losses = [], [], []
        for i in range(0, len(eval_samples), local_ebsz):
            group = eval_samples[i:i + local_ebsz]
            n = len(group)
            batch = collator(group)
            if n < local_ebsz:
                batch = {k: np.concatenate(
                    [v, np.repeat(v[-1:], local_ebsz - n, axis=0)])
                    for k, v in batch.items()}
            sb = host_local_batch_to_global(
                jax.tree.map(jnp.asarray, batch), mesh)
            losses.append(float(jit_eval(state.params, teacher, sb)["ce_loss"]))
            prompts = jnp.asarray([prompt] * (local_ebsz * n_proc), jnp.int32)
            out = gen_fn(state.params, sb["input_features"], prompts)
            # gather the global result, keep this host's rows for decoding
            seqs = gather_rows(out.sequences)[rowpos][:n]
            lens = gather_rows(out.seq_len)[rowpos][:n]
            for j in range(n):
                hyps.append(normalizer(tok.decode(
                    seqs[j][:lens[j]].tolist())))
                refs.append(normalizer(group[j]["text"]))
        from ..metrics.wer import WordErrors
        pairs = [(r, h) for r, h in zip(refs, hyps) if r.strip()]
        stats = (process_words([r for r, _ in pairs], [h for _, h in pairs])
                 if pairs else WordErrors())
        if n_proc > 1:  # aggregate error counts over hosts
            # EVERY host enters the collective — returning early on an
            # empty local shard would desync the allgather and the
            # coordinated save_best below, hanging the job
            from jax.experimental import multihost_utils
            counts = multihost_utils.process_allgather(
                np.asarray([stats.hits, stats.substitutions, stats.insertions,
                            stats.deletions, stats.num_ref_words], np.int64))
            h_, s_, i_, d_, nw = counts.reshape(-1, 5).sum(axis=0).tolist()
            stats = WordErrors(hits=h_, substitutions=s_, insertions=i_,
                               deletions=d_, num_ref_words=nw)
        if not stats.num_ref_words:
            return  # global decision: identical on every host
        wer = 100 * stats.wer
        logger.info("eval @%d: ce=%.4f wer=%.2f%% (I=%d S=%d D=%d)",
                    step, np.mean(losses), wer, stats.insertions,
                    stats.substitutions, stats.deletions)
        metrics_log.log(step, {"eval/ce_loss": float(np.mean(losses)),
                               "eval/wer": wer,
                               "eval/insertions": stats.insertions,
                               "eval/substitutions": stats.substitutions,
                               "eval/deletions": stats.deletions})
        if jax.process_index() == 0:
            # prediction table incl. the incorrect-only view (reference
            # log_pred, training/run_distillation.py:501-537)
            pred_path = Path(args.output_dir) / f"eval_predictions-{step}.jsonl"
            with open(pred_path, "w") as f:
                for r, h in zip(refs, hyps):
                    f.write(json.dumps({"norm_ref": r, "norm_pred": h,
                                        "correct": r == h}) + "\n")
        if wer < best_wer:
            best_wer = wer
            mgr.save_best(step, ckpt_view(state), wer)

    profiling = False
    for step in range(start_step, args.max_steps):
        if args.profile_steps:
            if step == start_step + 2:  # past compile + warmup
                jax.profiler.start_trace(args.profile_dir or
                                         str(Path(args.output_dir) / "trace"))
                profiling = True
            elif profiling and step == start_step + 2 + args.profile_steps:
                from ..utils.profiling import block
                block(metrics)  # traced steps must have actually executed
                jax.profiler.stop_trace()
                profiling = False
        raw = next_batch()
        if step == start_step:
            n_sup = int((raw["labels"] != -100).sum())
            if n_proc > 1:
                # agree globally: a single host raising while the others
                # enter the train-step collective would hang the job, and a
                # pathological local shard must not kill a healthy global run
                from jax.experimental import multihost_utils
                n_sup = int(multihost_utils.process_allgather(
                    np.asarray([n_sup], np.int64)).sum())
            if n_sup == 0:
                raise RuntimeError(
                    "first batch has zero supervised tokens — check that the "
                    "checkpoint's special-token ids match its tokenizer")
        batch = host_local_batch_to_global(jax.tree.map(jnp.asarray, raw),
                                           mesh)
        state, metrics = jit_train(state, teacher, batch)
        if (step + 1) % args.logging_steps == 0:
            m = {k: float(v) for k, v in metrics.items()}
            sps = (step + 1 - start_step) / (time.perf_counter() - t_start)
            logger.info("step %d: loss=%.4f ce=%.4f kl=%.4f gnorm=%.2f "
                        "(%.2f steps/s)", step + 1, m["loss"], m["ce_loss"],
                        m["kl_loss"], m["grad_norm"], sps)
            metrics_log.log(step + 1,
                            {**{f"train/{k}": v for k, v in m.items()},
                             "train/steps_per_second": sps})
        if (step + 1) % args.eval_steps == 0:
            run_eval(step + 1)
        if (step + 1) % args.save_steps == 0:
            mgr.save(step + 1, ckpt_view(state))
        stop = stop_requested["flag"]
        if n_proc > 1:
            # SIGTERM lands at different step boundaries per process; agree
            # across hosts BEFORE entering the coordinated save or its
            # barriers mismatch against the other hosts' train collectives.
            # Poll only at deterministic boundaries (logging/eval/save/last
            # step) — NOT whenever the local flag happens to be set (hosts
            # would enter the collective at different steps and deadlock)
            # and not every step (a blocking cross-host sync in the hot
            # loop); a few steps of preemption latency is fine.
            poll = ((step + 1) % args.logging_steps == 0
                    or (step + 1) % args.eval_steps == 0
                    or (step + 1) % args.save_steps == 0
                    or step + 1 == args.max_steps)
            if poll:
                from jax.experimental import multihost_utils
                stop = bool(multihost_utils.process_allgather(
                    np.asarray([stop], np.int32)).any())
            else:
                stop = False  # deferred to the next poll boundary
        if stop:
            mgr.save(step + 1, ckpt_view(state),
                     metadata={"preempted": True})
            logger.warning("preemption checkpoint written at step %d; "
                           "resume with --resume_from_checkpoint", step + 1)
            return None

    if profiling:
        jax.profiler.stop_trace()
    run_eval(args.max_steps)
    metrics_log.close()
    if args.max_steps % args.save_steps != 0:  # else just saved in the loop
        mgr.save(args.max_steps, ckpt_view(state))
    # final HF-format export (the reference's end-of-training-weights)
    final_dir = Path(args.output_dir) / "end-of-training-weights"
    if n_proc > 1:
        # params may be 2-D sharded across hosts (device_get would raise on
        # non-addressable shards); the orbax checkpoint above is the
        # multi-host artifact — convert it like the reference does
        # (convert_train_state_to_hf.py).  Return the checkpoint that
        # actually exists, not the unwritten HF export dir.
        ckpt_dir = Path(args.output_dir) / f"checkpoint-{args.max_steps}"
        logger.info("multi-process run: convert the final checkpoint with "
                    "dwt-convert --checkpoint_dir %s "
                    "--base_checkpoint %s --save_dir %s --distributed",
                    ckpt_dir, args.student_checkpoint, final_dir)
        return str(ckpt_dir)
    save_pretrained(to_fp32(jax.device_get(state.params)), student_cfg,
                    str(final_dir))
    copy_tokenizer_files(args.teacher_checkpoint, str(final_dir))
    logger.info("final weights exported to %s (best val WER %.2f%%)",
                final_dir, best_wer)
    return str(final_dir)


if __name__ == "__main__":
    main()
