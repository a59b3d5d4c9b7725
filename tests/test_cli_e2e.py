"""End-to-end four-stage recipe smoke test on a tiny random model
(the analogue of the reference's run_librispeech_dummy.sh scripts):

    pseudo-label -> create student -> distill -> eval (all four modes)
"""

import json
from pathlib import Path

import numpy as np
import pytest

from distil_whisper_tpu.tokenizer.bpe import bytes_to_unicode


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Tiny teacher checkpoint (torch, real whisper special-token layout) +
    tokenizer artifacts + a tiny dataset of tones."""
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    root = tmp_path_factory.mktemp("e2e")
    ckpt = root / "teacher"
    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=51865, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=4,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=96, decoder_ffn_dim=96,
        max_source_positions=1500, max_target_positions=448,
        dropout=0.0, suppress_tokens=None, begin_suppress_tokens=None,
        forced_decoder_ids=None,
        pad_token_id=50257, bos_token_id=50257, eos_token_id=50257,
        decoder_start_token_id=50258)
    WhisperForConditionalGeneration(hf_cfg).save_pretrained(str(ckpt))

    # tokenizer artifacts: byte units + filler to 50257, then real specials
    units = list(bytes_to_unicode().values())
    vocab = {u: i for i, u in enumerate(units)}
    for i in range(len(units), 50257):
        vocab[f"[unused{i}]"] = i
    with open(ckpt / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(ckpt / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
    added = {"<|endoftext|>": 50257, "<|startoftranscript|>": 50258,
             "<|en|>": 50259, "<|fr|>": 50265,
             "<|translate|>": 50358, "<|transcribe|>": 50359,
             "<|startoflm|>": 50360, "<|startofprev|>": 50361,
             "<|nospeech|>": 50362, "<|notimestamps|>": 50363}
    with open(ckpt / "added_tokens.json", "w") as f:
        json.dump(added, f)

    # tiny dataset: 6 utterances from 2 speakers
    import datasets
    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        secs = [2.0, 3.5, 5.0, 2.5, 4.0, 3.0][i]
        t = np.arange(int(secs * 16000)) / 16000.0
        audio = (0.2 * np.sin(2 * np.pi * (200 + 50 * i) * t)
                 + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
        rows.append({
            "audio": {"array": audio.tolist(), "sampling_rate": 16000},
            "text": ["the cat sat", "a dog ran fast", "hello world now",
                     "we are here", "it is late", "go home soon"][i],
            "speaker_id": "spk0" if i < 3 else "spk1",
        })
    ds = datasets.Dataset.from_list(rows)
    data_dir = root / "data"
    ds.save_to_disk(str(data_dir))
    return {"root": root, "teacher": str(ckpt), "data": str(data_dir)}


def test_stage1_pseudo_labelling(workspace):
    from distil_whisper_tpu.cli.run_pseudo_labelling import main
    out = main([
        "--model_checkpoint", workspace["teacher"],
        "--dataset_path", workspace["data"],
        "--output_dir", str(workspace["root"] / "pl"),
        "--per_device_batch_size", "2",
        "--language", "en",
        "--max_new_tokens", "12",
        "--speaker_id_column_name", "speaker_id",
        "--dtype", "float32",
    ])
    workspace["pl_dataset"] = out
    import datasets
    ds = datasets.load_from_disk(out)
    assert "whisper_transcript" in ds.column_names
    assert "condition_on_prev" in ds.column_names
    assert len(ds) >= 2  # packing may merge same-speaker utterances
    assert (workspace["root"] / "pl" / "transcriptions.csv").exists()


def test_stage2_create_student(workspace):
    from distil_whisper_tpu.cli.create_student_model import main
    student_dir = str(workspace["root"] / "student-init")
    main([
        "--teacher_checkpoint", workspace["teacher"],
        "--save_dir", student_dir,
        "--decoder_layers", "2",
    ])
    workspace["student"] = student_dir
    from distil_whisper_tpu.config import WhisperConfig
    cfg = WhisperConfig.from_pretrained(student_dir)
    assert cfg.decoder_layers == 2
    assert (Path(student_dir) / "vocab.json").exists()


def test_stage3_distillation(workspace):
    from distil_whisper_tpu.cli.run_distillation import main
    out_dir = str(workspace["root"] / "distilled")
    final = main([
        "--teacher_checkpoint", workspace["teacher"],
        "--student_checkpoint", workspace["student"],
        "--train_dataset_path", workspace["pl_dataset"],
        "--eval_dataset_path", workspace["data"],
        "--output_dir", out_dir,
        "--max_steps", "4",
        "--per_device_train_batch_size", "1",
        "--per_device_eval_batch_size", "2",
        "--warmup_steps", "1",
        "--wer_threshold", "100000",
        "--eval_steps", "4",
        "--save_steps", "2",
        "--logging_steps", "1",
        "--language", "en",
        "--precision", "full",
        "--eval_max_new_tokens", "8",
    ])
    workspace["distilled"] = final
    assert (Path(final) / "model.safetensors").exists()
    assert (Path(out_dir) / "checkpoint-4").exists()


def test_stage3b_qat_distillation_then_int8_eval(workspace):
    """The QAT recipe end-to-end through the CLIs: distill with
    --quantize_student w8a8 (student decoder trains through the int8
    serve-time numerics, ops/qat.py), then run_eval --quantize_decoder
    on the exported artifact — the operating point QAT trained for."""
    from distil_whisper_tpu.cli.run_distillation import main
    out_dir = str(workspace["root"] / "distilled-qat")
    final = main([
        "--teacher_checkpoint", workspace["teacher"],
        "--student_checkpoint", workspace["student"],
        "--train_dataset_path", workspace["pl_dataset"],
        "--output_dir", out_dir,
        "--max_steps", "3",
        "--per_device_train_batch_size", "1",
        "--warmup_steps", "1",
        "--wer_threshold", "100000",
        "--save_steps", "3",
        "--logging_steps", "1",
        "--language", "en",
        "--precision", "full",
        "--quantize_student", "w8a8",
    ])
    assert (Path(final) / "model.safetensors").exists()

    from distil_whisper_tpu.cli.run_eval import main as eval_main
    res = eval_main([
        "--model_checkpoint", final,
        "--dataset_path", workspace["data"],
        "--mode", "short",
        "--language", "en",
        "--batch_size", "2",
        "--max_new_tokens", "8",
        "--dtype", "float32",
        "--quantize_decoder",
    ])
    assert res["rtfx"] > 0 and "wer" in res


def test_stage4_eval_all_modes(workspace):
    from distil_whisper_tpu.cli.run_eval import main
    common = [
        "--dataset_path", workspace["data"],
        "--language", "en",
        "--batch_size", "2",
        "--max_new_tokens", "8",
        "--dtype", "float32",
    ]
    for mode in ("short", "sequential", "chunked"):
        res = main(["--model_checkpoint", workspace["distilled"],
                    "--mode", mode] + common)
        assert res["rtfx"] > 0 and "wer" in res, mode
    res = main(["--model_checkpoint", workspace["teacher"],
                "--assistant_checkpoint", workspace["distilled"],
                "--mode", "speculative"] + common)
    assert res["rtfx"] > 0 and "wer" in res


def test_stage4b_eval_speculative_longform(workspace):
    """Speculation composed with BOTH long-form modes through the CLI
    (VERDICT r4 #1b/#2): draft-free ngram needs no assistant; draft rides
    --assistant_checkpoint.  Output structure matches the plain modes."""
    from distil_whisper_tpu.cli.run_eval import main
    common = [
        "--dataset_path", workspace["data"],
        "--language", "en",
        "--batch_size", "2",
        "--max_new_tokens", "8",
        "--dtype", "float32",
        "--gamma", "2",
    ]
    for mode in ("sequential", "chunked"):
        res = main(["--model_checkpoint", workspace["distilled"],
                    "--mode", mode, "--speculative_method", "ngram"] + common)
        assert res["rtfx"] > 0 and "wer" in res, mode
        res = main(["--model_checkpoint", workspace["teacher"],
                    "--assistant_checkpoint", workspace["distilled"],
                    "--mode", mode] + common)
        assert res["rtfx"] > 0 and "wer" in res, mode
    # conflicting flags must be rejected, not silently resolved
    import pytest as _pytest
    with _pytest.raises(ValueError):
        main(["--model_checkpoint", workspace["teacher"],
              "--assistant_checkpoint", workspace["distilled"],
              "--mode", "sequential", "--speculative_method", "ngram"]
             + common)


def test_stage5_validate_real_weights_rehearsal(workspace):
    """Drive scripts/validate_real_weights.sh end-to-end on the tiny random
    checkpoint (VERDICT r4 #4): first contact with real weights must not be
    the first execution of the pack's bash/JSON plumbing.  Expectations are
    opened wide via the documented env knobs — the rehearsal proves the
    pipeline (4 eval modes -> JSON -> gate), not the WER values."""
    import os
    import subprocess
    import sys

    repo = Path(__file__).resolve().parent.parent
    out_dir = workspace["root"] / "real_weights_rehearsal"
    env = dict(os.environ)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    if str(repo) not in pp:
        pp.insert(0, str(repo))
    if "/root/.axon_site" not in pp and os.path.isdir("/root/.axon_site"):
        pp.append("/root/.axon_site")
    env.update({
        "PYTHONPATH": os.pathsep.join(pp),
        "DWT_PLATFORM": "cpu",      # pin the spawned CLIs to the host backend
        "BATCH": "2",
        "MAX_NEW": "8",
        "DTYPE": "float32",
        "OUT_DIR": str(out_dir),
        # random weights -> garbage WER; the gates are rehearsed wide open
        "EXPECTED_SHORT": "100000",
        "INT8_TOL": "100000",
        "SEQ_TOL": "100000",
    })
    proc = subprocess.run(
        ["bash", str(repo / "scripts" / "validate_real_weights.sh"),
         workspace["teacher"], workspace["data"]],
        env=env, cwd=str(repo), capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-3000:])
    for name in ("short_bf16", "short_int8", "seq_bf16", "chunked_bf16"):
        with open(out_dir / f"{name}.json") as f:
            assert "wer" in json.load(f), name
    assert "[PASS] short-form bf16 WER vs published" in proc.stdout
    assert proc.stdout.count("[PASS]") == 3
