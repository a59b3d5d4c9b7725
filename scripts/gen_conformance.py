"""Generate CONFORMANCE.md: reference CLI flag -> repo equivalent table.

Mechanically auditable parity (VERDICT r2 item 10):

* reference flags are EXTRACTED live from /root/reference/training/
  {run_distillation,run_eval,run_pseudo_labelling,create_student_model}.py
  (HfArgumentParser dataclass fields + the Seq2SeqTrainingArguments fields
  each script actually consumes);
* every repo-side flag named in the mapping is VALIDATED against the repo's
  argparse sources — a typo'd or removed flag fails the generator;
* any reference flag missing from the curated mapping fails the generator —
  new knobs upstream can't silently go unmapped.

Run: python scripts/gen_conformance.py   (writes CONFORMANCE.md)
"""

import re
import sys
from pathlib import Path

REF = Path("/root/reference/training")
REPO = Path(__file__).resolve().parent.parent
CLI = REPO / "distil_whisper_tpu" / "cli"

ZERO_EGRESS = "n/a — Hub/network access (zero-egress: local artifacts only)"
ONE_DIR = ("n/a — a single local checkpoint dir carries config + tokenizer; "
           "mel numerics are in-tree (audio/mel.py)")
LOCAL_DS = "n/a — local datasets carry their config (`load_dataset_any` path)"
CUDA_ATTN = ("n/a — CUDA attention-backend selection; the TPU best path "
             "(Pallas flash encoder, merged-KV decode) is automatic, with "
             "`--quantize_encoder/--quantize_cross_kv/--quantize_self_kv` "
             "as the TPU-side perf knobs")
TORCH_DL = ("n/a — no torch DataLoader; `--streaming` prefetch + "
            "`--shuffle_buffer_size` replace it")
DDP = ("n/a — torch/Accelerate process topology; GSPMD mesh via "
       "`--model_parallel` / `--param_sharding` / `--distributed`")
SLICE = "n/a — slice the dataset before the run (datasets.Dataset.select)"
PL_DDP = ("n/a — torch/Accelerate process topology; labelling runs "
          "embarrassingly parallel per-host local meshes (`--distributed` "
          "for pod init, `--dtype` for precision)")

# {ref script: {ref flag: ours}} — "--x" entries are validated to exist.
MAPPING = {
    "run_distillation.py": {
        # ModelArguments
        "model_name_or_path": "`--student_checkpoint`",
        "teacher_model_name_or_path": "`--teacher_checkpoint`",
        "config_name": ONE_DIR, "tokenizer_name": ONE_DIR,
        "feature_extractor_name": ONE_DIR,
        "cache_dir": ZERO_EGRESS, "use_fast_tokenizer": ONE_DIR,
        "model_revision": ZERO_EGRESS, "subfolder": ZERO_EGRESS,
        "token": ZERO_EGRESS, "attn_implementation": CUDA_ATTN,
        # DataTrainingArguments
        "train_dataset_name": "`--train_dataset_path`",
        "train_dataset_config_name": LOCAL_DS,
        "train_split_name": "`--train_splits`",
        "train_dataset_samples": "`--dataset_probabilities`",
        "eval_dataset_name": "`--eval_dataset_path`",
        "eval_dataset_config_name": LOCAL_DS,
        "eval_split_name": LOCAL_DS,
        "eval_text_column_name":
            "n/a — prepared datasets standardise on a `text` column",
        "text_column_name":
            "n/a — prepared datasets standardise on a `text` column",
        "audio_column_name":
            "n/a — PL output standardises on `audio` (the PL driver itself "
            "exposes the column-name knobs)",
        "dataset_cache_dir": ZERO_EGRESS,
        "overwrite_cache":
            "n/a — delete the `--preprocessed_cache` dir to re-prepare",
        "preprocessing_num_workers":
            "n/a — prep is one pass; `--streaming` overlaps it with training",
        "preprocessing_batch_size":
            "n/a — per-sample streaming prep (no batched map)",
        "max_train_samples": SLICE, "max_eval_samples": SLICE,
        "max_duration_in_seconds": "`--max_duration_s`",
        "min_duration_in_seconds": "`--min_duration_s`",
        "max_label_length": "`--max_label_length`",
        "pad_target_to_multiple_of":
            "n/a — collator pads to the fixed `--max_label_length` "
            "(static shapes: one compiled program, zero recompiles)",
        "timestamp_probability": "`--timestamp_probability`",
        "condition_on_prev_probability": "`--condition_on_prev_probability`",
        "return_timestamps":
            "n/a — timestamp labels governed by `--timestamp_probability` / "
            "`--round_timestamps`",
        "language": "`--language`", "task": "`--task`",
        "use_pseudo_labels": "`--use_pseudo_labels` / `--no_pseudo_labels`",
        "wer_threshold": "`--wer_threshold`",
        "streaming": "`--streaming`",
        "preprocessing_only": "`--preprocessing_only`",
        "wandb_project": "`--report_to` wandb + WANDB_PROJECT env",
        "wandb_name": "n/a — run name = `--output_dir` basename",
        "wandb_dir": "n/a — W&B env vars (WANDB_DIR)",
        # DistillationTrainingArguments (+ consumed Seq2SeqTrainingArguments)
        "freeze_encoder": "`--freeze_encoder` / `--train_encoder`",
        "freeze_decoder": "`--freeze_decoder`",
        "freeze_embed_positions": "`--freeze_embed_positions`",
        "temperature": "`--temperature`",
        "kl_weight": "`--kl_weight`",
        "dtype": "`--precision` (full / half_mixed / full_mixed)",
        "save_best_total_limit": "`--save_best_total_limit`",
        "adam_beta1": "`--adam_beta1`",
        "adam_beta2": "`--adam_beta2`",
        "adam_epsilon": "`--adam_epsilon`",
        "dataloader_num_workers": TORCH_DL,
        "dataloader_pin_memory": TORCH_DL,
        "dataloader_prefetch_factor": TORCH_DL,
        "device": DDP, "n_gpu": DDP, "local_rank": DDP,
        "parallel_mode": DDP, "fp16": DDP,
        "do_train": "n/a — training always runs",
        "do_eval": "n/a — eval runs iff `--eval_dataset_path` is given",
        "eval_steps": "`--eval_steps`",
        "generation_num_beams":
            "n/a — in-training eval is greedy (`--eval_max_new_tokens`); "
            "beam eval via `run_eval --num_beams`",
        "gradient_accumulation_steps": "`--gradient_accumulation_steps`",
        "gradient_checkpointing": "`--gradient_checkpointing`",
        "hub_model_id": ZERO_EGRESS, "hub_token": ZERO_EGRESS,
        "push_to_hub": ZERO_EGRESS,
        "learning_rate": "`--learning_rate`",
        "lr_scheduler_type": "`--lr_scheduler_type`",
        "warmup_steps": "`--warmup_steps`",
        "weight_decay": "`--weight_decay`",
        "max_grad_norm": "`--max_grad_norm`",
        "max_steps": "`--max_steps`",
        "num_train_epochs":
            "n/a — the recipe is step-based (`--max_steps`; reference trains "
            "by steps too, README 80k)",
        "output_dir": "`--output_dir`",
        "overwrite_output_dir":
            "n/a — checkpoints rotate in place; delete the dir to restart",
        "per_device_train_batch_size": "`--per_device_train_batch_size`",
        "per_device_eval_batch_size": "`--per_device_eval_batch_size`",
        "predict_with_generate":
            "n/a — eval always computes CE loss AND generate-WER",
        "report_to": "`--report_to`",
        "resume_from_checkpoint": "`--resume_from_checkpoint`",
        "save_steps": "`--save_steps`",
        "save_total_limit": "`--save_total_limit`",
        "seed": "`--seed`",
        "logging_steps": "`--logging_steps`",
    },
    "run_eval.py": {
        "model_name_or_path": "`--model_checkpoint`",
        "dataset_name": "`--dataset_path`",
        "dataset_config_name": LOCAL_DS,
        "dataset_split_name": "`--split`",
        "dataset_cache_dir": ZERO_EGRESS, "cache_dir": ZERO_EGRESS,
        "overwrite_cache": ZERO_EGRESS,
        "use_fast_tokenizer": ONE_DIR, "subfolder": ZERO_EGRESS,
        "model_variant": "n/a — torch weight-variant selection",
        "attn_implementation": CUDA_ATTN,
        "assistant_model_name_or_path": "`--assistant_checkpoint`",
        "audio_column_name":
            "n/a — eval sets standardise on `audio`",
        "text_column_name":
            "n/a — eval sets standardise on `text`",
        "batch_size": "`--batch_size`",
        "chunk_length_s": "`--chunk_length_s`",
        "num_beams": "`--num_beams` (short / sequential / chunked)",
        "language": "`--language`", "task": "`--task`",
        "compression_ratio_threshold": "`--compression_ratio_threshold`",
        "condition_on_prev_tokens": "`--condition_on_prev`",
        "logprob_threshold": "`--logprob_threshold`",
        "no_speech_threshold": "`--no_speech_threshold`",
        "temperature_fallback": "`--temperature_fallback`",
        "dtype": "`--dtype`",
        "generation_max_length": "`--max_new_tokens`",
        "log_predictions":
            "per-split predictions + metrics written to `--output_json`",
        "max_eval_samples": SLICE, "num_batches": SLICE,
        "samples_per_dataset": SLICE,
        "num_tokens": "`--max_new_tokens` (with `--precise_tok_per_s`)",
        "only_long_form": "`--mode` sequential/chunked",
        "only_short_form": "`--mode` short",
        "precise_tok_per_s": "`--precise_tok_per_s`",
        "preprocessing_num_workers": "n/a — features computed on device",
        "preprocessing_only": "n/a — no separate preprocessing phase",
        "prompt_text": "`--prompt_text`",
        "return_timestamps": "`--return_timestamps`",
        "seed":
            "n/a — greedy/beam eval is deterministic; fallback sampling is "
            "seeded internally",
        "streaming": "n/a — eval sets are local and finite",
        "use_pipeline": "`--mode` chunked",
        "wandb_project": "n/a — JSON artifact via `--output_json`",
        "wandb_name": "n/a — JSON artifact via `--output_json`",
        "wandb_dir": "n/a — JSON artifact via `--output_json`",
        "wandb_job_type": "n/a — JSON artifact via `--output_json`",
        "save_code_to_wandb": ZERO_EGRESS,
    },
    "run_pseudo_labelling.py": {
        "model_name_or_path": "`--model_checkpoint`",
        "dataset_name": "`--dataset_path`",
        "dataset_config_name": LOCAL_DS,
        "dataset_split_name": "`--split`",
        "dataset_cache_dir": ZERO_EGRESS, "cache_dir": ZERO_EGRESS,
        "overwrite_cache": ZERO_EGRESS,
        "config_name": ONE_DIR, "tokenizer_name": ONE_DIR,
        "feature_extractor_name": ONE_DIR, "processor_name": ONE_DIR,
        "use_fast_tokenizer": ONE_DIR,
        "model_revision": ZERO_EGRESS, "subfolder": ZERO_EGRESS,
        "token": ZERO_EGRESS, "private_dataset": ZERO_EGRESS,
        "attn_implementation": CUDA_ATTN, "attn_type": CUDA_ATTN,
        "audio_column_name": "`--audio_column_name`",
        "text_column_name": "`--text_column_name`",
        "speaker_id_column_name": "`--speaker_id_column_name`",
        "id_column_name":
            "n/a — rows keyed by running index in the incremental CSV",
        "concatenate_audio":
            "`--concatenate_audio` / `--no_concatenate_audio`",
        "dtype": "`--dtype`",
        "language": "`--language`", "task": "`--task`",
        "return_timestamps": "`--return_timestamps` / `--no_timestamps`",
        "max_label_length": "`--max_new_tokens`",
        "max_duration_in_seconds":
            "n/a — 30 s packing caps windows; duration filters applied at "
            "the distillation stage (`--min/--max_duration_s`)",
        "max_samples_per_split": SLICE,
        "decode_token_ids":
            "n/a — transcripts stored as text with timestamp markup "
            "(always decoded)",
        "preprocessing_num_workers": "`--featurizer_workers`",
        "preprocessing_batch_size": "`--featurizer_workers`",
        "preprocessing_only":
            "n/a — streaming produce overlaps generate; no separate phase",
        "streaming": "always on — the corpus streams by design",
        "wandb_project": "n/a — progress via logs + incremental CSV",
        # consumed Seq2SeqTrainingArguments
        "generation_num_beams": "`--num_beams`",
        "gradient_accumulation_steps":
            "n/a — inference driver (no optimizer step)",
        "dataloader_num_workers": "`--featurizer_workers`",
        "per_device_eval_batch_size": "`--per_device_batch_size`",
        "logging_steps": "`--logging_steps`",
        "output_dir": "`--output_dir`",
        "push_to_hub": ZERO_EGRESS, "hub_model_id": ZERO_EGRESS,
        "hub_token": ZERO_EGRESS,
        "report_to": "n/a — driver logs + incremental CSV/Arrow",
        "device": PL_DDP, "n_gpu": PL_DDP, "local_rank": PL_DDP,
        "parallel_mode": PL_DDP, "fp16": PL_DDP,
    },
    "create_student_model.py": {
        "teacher_checkpoint": "`--teacher_checkpoint`",
        "encoder_layers": "`--encoder_layers`",
        "decoder_layers": "`--decoder_layers`",
        "decoder_layers_numbers": "`--decoder_layers_numbers`",
        "save_dir": "`--save_dir`",
        "cache_dir": ZERO_EGRESS, "subfolder": ZERO_EGRESS,
        "push_to_hub": ZERO_EGRESS,
    },
}

# which repo CLI file answers for each reference script
OURS_FILE = {
    "run_distillation.py": ["run_distillation.py"],
    "run_eval.py": ["run_eval.py"],
    "run_pseudo_labelling.py": ["run_pseudo_labelling.py"],
    "create_student_model.py": ["create_student_model.py"],
}


def ref_flags(script: str):
    text = (REF / script).read_text()
    fields = set(re.findall(r"^    (\w+): [^=\n]+ = (?:field|list_field)\(",
                            text, re.M))
    fields |= set(re.findall(r'add_argument\(\s*"--(\w+)"', text))
    # Seq2SeqTrainingArguments fields the script consumes
    consumed = set(re.findall(r"training_args\.([a-z_0-9]+)", text))
    consumed -= {"fp", "adam_beta", "py"}  # partial/junk regex matches
    if "training_args.fp16" in text:
        consumed.add("fp16")
    if "training_args.adam_beta1" in text:
        consumed |= {"adam_beta1", "adam_beta2"}
    return sorted(fields | consumed)


def our_flags(files):
    out = set()
    for f in files:
        out |= set(re.findall(r'"--([a-z_0-9]+)"', (CLI / f).read_text()))
    return out


def main():
    errors = []
    lines = [
        "# CONFORMANCE — reference CLI flags vs distil_whisper_tpu",
        "",
        "Generated by `scripts/gen_conformance.py` (regenerate after flag "
        "changes; the generator FAILS on unmapped reference flags or "
        "nonexistent repo flags).  Reference = the maintained PyTorch "
        "drivers under `/root/reference/training/`; dataclass fields plus "
        "the `Seq2SeqTrainingArguments` fields each script actually "
        "consumes.",
        "",
    ]
    for script, mapping in MAPPING.items():
        flags = ref_flags(script)
        ours = our_flags(OURS_FILE[script])
        lines += [f"## {script} → `distil_whisper_tpu/cli/"
                  f"{OURS_FILE[script][0]}`", "",
                  "| reference flag | this framework |", "|---|---|"]
        for flag in flags:
            if flag not in mapping:
                errors.append(f"{script}: unmapped reference flag '{flag}'")
                continue
            val = mapping[flag]
            for m in re.findall(r"`--([a-z_0-9]+)`", val):
                if m not in ours:
                    errors.append(f"{script}: mapping for '{flag}' names "
                                  f"nonexistent repo flag --{m}")
            lines.append(f"| `{flag}` | {val} |")
        stale = set(mapping) - set(flags)
        if stale:
            errors.append(f"{script}: mapping has stale entries {stale}")
        lines.append("")
    # capabilities beyond the reference surface
    lines += [
        "## Repo flags with no reference counterpart (capability additions)",
        "",
        "`--quantize_encoder` `--quantize_decoder` `--quantize_lm_head` `--quantize_cross_kv` "
        "`--quantize_self_kv` "
        "(int8 MXU/HBM paths), `--loss_chunk_size` (never materialise the "
        "[B,S,V] logits pair), `--param_sharding 2d` (FSDP-style), "
        "`--distributed` (fail-fast pod init), `--profile_steps` "
        "(jax.profiler traces), `--featurizer_workers` (PL GIL escape), "
        "`--noise_snr_db` (noise eval in one driver), `--gamma` "
        "(speculative draft length), `--teacher_precision` (serve the "
        "no-grad teacher side of distillation with the inference/int8 "
        "stack), `--quantize_student` (quantization-aware training: STE "
        "fake-quant of the student's decoder against the exact int8 "
        "serving numerics, ops/qat.py), sweep runner (`run_sweep`), "
        "checkpoint converter (`convert_checkpoint_to_hf`).", "",
    ]
    if errors:
        print("\n".join("ERROR: " + e for e in errors))
        sys.exit(1)
    out = REPO / "CONFORMANCE.md"
    out.write_text("\n".join(lines))
    n = sum(len(ref_flags(s)) for s in MAPPING)
    print(f"wrote {out} ({n} reference flags mapped)")


if __name__ == "__main__":
    main()
