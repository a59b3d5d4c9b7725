"""Sweep runner: grid expansion, per-run execution, metric pick-up, best.json."""

import json

import pytest

from tests.helpers import make_tiny_checkpoint, make_tone_dataset


def test_expand_configs_grid_and_random():
    from distil_whisper_tpu.cli.run_sweep import expand_configs
    spec = {"method": "grid",
            "parameters": {"lr": {"values": [1, 2]},
                           "bs": {"values": [8, 16]},
                           "steps": {"value": 5}}}
    cfgs = expand_configs(spec, max_runs=0, seed=0)
    assert len(cfgs) == 4
    assert all(c["steps"] == 5 for c in cfgs)
    assert {(c["bs"], c["lr"]) for c in cfgs} == {(8, 1), (8, 2), (16, 1), (16, 2)}

    rnd = expand_configs({**spec, "method": "random"}, max_runs=3, seed=0)
    assert len(rnd) == 3
    assert all(c["bs"] in (8, 16) and c["lr"] in (1, 2) for c in rnd)


@pytest.mark.slow
def test_sweep_end_to_end(tmp_path):
    """Two-config distillation grid sweep on a tiny checkpoint: both runs
    execute, metrics are read from metrics.jsonl, best.json is written."""
    ck = make_tiny_checkpoint(tmp_path / "ck")
    data = make_tone_dataset(tmp_path / "data", n=4)
    spec = {
        "program": "distillation",
        "method": "grid",
        "metric": {"name": "train/loss", "goal": "minimize"},
        "command_args": ["--no_pseudo_labels", "--precision", "full",
                         "--logging_steps", "1", "--save_steps", "100"],
        "parameters": {
            "learning_rate": {"values": [1e-4, 1e-3]},
            "max_steps": {"value": 2},
            "per_device_train_batch_size": {"value": 2},
        },
    }
    spec_path = tmp_path / "sweep.json"
    spec_path.write_text(json.dumps(spec))

    from distil_whisper_tpu.cli.run_sweep import main
    best = main(["--sweep_config", str(spec_path),
                 "--output_dir", str(tmp_path / "sweep"),
                 "--teacher_checkpoint", ck,
                 "--student_checkpoint", ck,
                 "--train_dataset_path", data,
                 "--train_splits", "train"])
    rows = [json.loads(l) for l in
            open(tmp_path / "sweep" / "sweep_results.jsonl")]
    assert len(rows) == 2
    assert all(r["status"] == "ok" and r["value"] is not None for r in rows)
    assert best is not None
    assert (tmp_path / "sweep" / "best.json").exists()
    assert best["value"] == min(r["value"] for r in rows)
