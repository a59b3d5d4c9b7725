"""Convert an Orbax training checkpoint to an HF-format model directory.

CLI mirror of the reference's multi-host-aware
``flax/convert_train_state_to_hf.py``: restores the TrainState (sharded ok),
extracts fp32 params, writes config.json + model.safetensors + tokenizer
artifacts.  Run under multihost with ``--distributed`` to initialise
``jax.distributed`` first.

    python -m distil_whisper_tpu.cli.convert_checkpoint_to_hf \
        --checkpoint_dir ./run/checkpoint-80000 \
        --base_checkpoint ./distil-init --save_dir ./distil-final
"""

from __future__ import annotations

import argparse

import jax

from ..models import load_params, save_pretrained
from ..models.params import to_fp32
from ..parallel.multihost import maybe_initialize_distributed
from ..training import (CheckpointManager, OptimizerConfig, TrainState,
                        make_optimizer)
from .common import copy_tokenizer_files, logger, setup_logging


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_dir", required=True,
                   help="a checkpoint-{step} dir or its parent output dir")
    p.add_argument("--base_checkpoint", required=True,
                   help="HF dir defining the architecture (student init)")
    p.add_argument("--save_dir", required=True)
    p.add_argument("--distributed", action="store_true")
    args = p.parse_args(argv)
    setup_logging()
    if args.distributed:
        maybe_initialize_distributed(force=True)

    params, cfg = load_params(args.base_checkpoint)
    opt_cfg = OptimizerConfig(total_steps=1, precision="full")
    tx = make_optimizer(opt_cfg, params)
    template, _ = TrainState.create(params, opt_cfg, tx)

    from pathlib import Path
    path = Path(args.checkpoint_dir)
    if (path / "state").exists():
        mgr = CheckpointManager(str(path.parent))
        state = mgr.restore(str(path), jax.device_get(template))
        step = path.name
    else:
        mgr = CheckpointManager(str(path))
        resumed = mgr.resume_latest(jax.device_get(template))
        if resumed is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        step, state = resumed

    save_pretrained(to_fp32(state.params), cfg, args.save_dir)
    copy_tokenizer_files(args.base_checkpoint, args.save_dir)
    logger.info("checkpoint %s exported to %s", step, args.save_dir)
    return args.save_dir


if __name__ == "__main__":
    main()
