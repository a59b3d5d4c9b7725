"""Plain CE fine-tuning (no teacher) — CLI mirror of the reference
``flax/run_finetuning.py``: same skeleton as distillation with label-smoothed
cross-entropy only.

    python -m distil_whisper_tpu.cli.run_finetuning \
        --model_checkpoint /ckpts/whisper-small \
        --train_dataset_path ./data --output_dir ./ft-run --max_steps 5000
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models import load_params, param_axes, save_pretrained
from ..models.params import to_fp32
from ..parallel import (make_mesh, shard_params, shardings_for_tree,
                        DEFAULT_RULES, RULES_2D,
                        maybe_initialize_distributed,
                        host_local_batch_to_global, process_local_slice)
from ..tokenizer import (WhisperTokenizer, EnglishTextNormalizer,
                         BasicTextNormalizer)
from ..training import (Collator, OptimizerConfig, TrainState,
                        build_finetune_step, CheckpointManager, make_optimizer,
                        place_state)
from ..utils.profiling import MetricsLogger
from .common import load_dataset_any, logger, setup_logging, copy_tokenizer_files
from .run_distillation import _prepare_samples


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_checkpoint", required=True)
    p.add_argument("--train_dataset_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--per_device_train_batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--label_smoothing", type=float, default=0.0)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--precision", default="half_mixed",
                   choices=["full", "half_mixed", "full_mixed"])
    p.add_argument("--freeze_encoder", action="store_true")
    p.add_argument("--quantize_student", default="none",
                   choices=["none", "weights", "w8a8"],
                   help="quantization-aware training (ops/qat.py): "
                        "fake-quantize the model's projections/MLP in the "
                        "forward (decoder always; encoder too unless "
                        "--freeze_encoder) with straight-through gradients "
                        "so the finetuned weights serve faithfully under "
                        "the int8 inference stack")
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--max_label_length", type=int, default=448)
    p.add_argument("--min_duration_s", type=float, default=0.0)
    p.add_argument("--max_duration_s", type=float, default=30.0)
    p.add_argument("--language", default=None)
    p.add_argument("--task", default="transcribe")
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--save_total_limit", type=int, default=1)
    p.add_argument("--logging_steps", type=int, default=25)
    p.add_argument("--report_to", default="jsonl",
                   help="comma list of metrics sinks: jsonl / tensorboard / "
                        "wandb (see run_distillation --report_to)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace of this many steps "
                        "(starting 2 steps in, past compile)")
    p.add_argument("--profile_dir", default=None,
                   help="trace output dir (default <output_dir>/trace)")
    p.add_argument("--distributed", action="store_true",
                   help="fail fast unless jax.distributed comes up multi-process (use on pods/orchestrators where auto-detection is unreliable)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--param_sharding", default="1d", choices=["1d", "2d"])
    args = p.parse_args(argv)
    setup_logging()
    maybe_initialize_distributed(force=args.distributed)
    rng = np.random.default_rng(args.seed)

    params, cfg = load_params(args.model_checkpoint)
    tok = WhisperTokenizer.from_pretrained(args.model_checkpoint)
    normalizer = (EnglishTextNormalizer(tok.spelling_mapping)
                  if args.language in (None, "en", "english")
                  else BasicTextNormalizer())

    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev // args.model_parallel, args.model_parallel))
    rules = RULES_2D if args.param_sharding == "2d" else DEFAULT_RULES
    params = shard_params(params, param_axes(cfg), mesh, rules)

    opt_cfg = OptimizerConfig(
        learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
        total_steps=args.max_steps, weight_decay=args.weight_decay,
        b1=args.adam_beta1, b2=args.adam_beta2, eps=args.adam_epsilon,
        precision=args.precision,
        frozen_prefixes=("encoder",) if args.freeze_encoder else ())
    tx = make_optimizer(opt_cfg, to_fp32(params))
    state, tx = TrainState.create(params, opt_cfg, tx)
    shardings = shardings_for_tree(param_axes(cfg), mesh, rules)
    state = place_state(state, tx, mesh, shardings)

    train_step, _ = build_finetune_step(
        cfg, opt_cfg, tx, label_smoothing=args.label_smoothing,
        remat=args.gradient_checkpointing, freeze_encoder=args.freeze_encoder,
        quantize_student=args.quantize_student)
    jit_train = jax.jit(train_step, donate_argnums=(0,))

    ft_args = argparse.Namespace(**{**vars(args), "use_pseudo_labels": False,
                                    "wer_threshold": None,
                                    "timestamp_probability": 0.0,
                                    "condition_on_prev_probability": 0.0})
    train_ds = load_dataset_any(args.train_dataset_path, "train")
    n_proc = jax.process_count()
    prep_sharded = False
    if n_proc > 1 and hasattr(train_ds, "shard"):
        # shard BEFORE preparation — each host only pays mel/filter cost for
        # its 1/n_proc (the train loop cycles, so unequal counts are fine)
        train_ds = train_ds.shard(num_shards=n_proc,
                                  index=jax.process_index(), contiguous=True)
        prep_sharded = True
    samples = _prepare_samples(train_ds, tok, cfg, ft_args, normalizer, rng)
    # mask prompts with the tokenizer's SOT (see run_distillation)
    collator = Collator(decoder_start_token_id=tok.sot,
                        pad_token_id=cfg.pad_token_id,
                        max_target_length=args.max_label_length)
    mgr = CheckpointManager(args.output_dir,
                            save_total_limit=args.save_total_limit)

    if n_proc > 1 and not prep_sharded:
        samples = samples[process_local_slice(len(samples))]
    local_bsz = max(
        args.per_device_train_batch_size * mesh.shape["data"] // n_proc, 1)
    metrics_log = MetricsLogger(
        str(Path(args.output_dir) / "metrics.jsonl"),
        report_to=tuple(s.strip() for s in args.report_to.split(",")),
        run_name=Path(args.output_dir).name)
    order = rng.permutation(len(samples))
    cursor = 0
    t0 = time.perf_counter()
    profiling = False
    for step in range(args.max_steps):
        if args.profile_steps:
            if step == 2:  # past compile + warmup
                jax.profiler.start_trace(args.profile_dir or
                                         str(Path(args.output_dir) / "trace"))
                profiling = True
            elif profiling and step == 2 + args.profile_steps:
                from ..utils.profiling import block
                block(metrics)
                jax.profiler.stop_trace()
                profiling = False
        idx = []
        while len(idx) < local_bsz:
            if cursor >= len(order):
                order = rng.permutation(len(samples))
                cursor = 0
            idx.append(order[cursor])
            cursor += 1
        batch = host_local_batch_to_global(jax.tree.map(
            jnp.asarray, collator([samples[i] for i in idx])), mesh)
        state, metrics = jit_train(state, batch)
        if (step + 1) % args.logging_steps == 0:
            loss = float(metrics["loss"])
            sps = (step + 1) / (time.perf_counter() - t0)
            logger.info("step %d: loss=%.4f (%.2f steps/s)",
                        step + 1, loss, sps)
            metrics_log.log(step + 1, {"train/loss": loss,
                                       "train/steps_per_second": sps})
        if (step + 1) % args.save_steps == 0:
            # multi-process: pass global jax.Arrays — orbax coordinates the
            # sharded multi-host save (cf. run_distillation.ckpt_view)
            mgr.save(step + 1, state if n_proc > 1 else jax.device_get(state))
    if profiling:
        jax.profiler.stop_trace()
    metrics_log.close()
    if args.max_steps % args.save_steps != 0:
        # the loop's last periodic save missed the final steps — without
        # this a multi-process run (which skips the inline HF export) would
        # lose the training tail entirely
        mgr.save(args.max_steps,
                 state if n_proc > 1 else jax.device_get(state))

    final_dir = Path(args.output_dir) / "end-of-training-weights"
    if n_proc > 1:
        logger.info("multi-process run: convert the final checkpoint with "
                    "dwt-convert (see run_distillation for the recipe)")
        return str(final_dir)
    save_pretrained(to_fp32(jax.device_get(state.params)), cfg, str(final_dir))
    copy_tokenizer_files(args.model_checkpoint, str(final_dir))
    logger.info("final weights exported to %s", final_dir)
    return str(final_dir)


if __name__ == "__main__":
    main()
