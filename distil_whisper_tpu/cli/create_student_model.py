"""Initialise a distil student from a teacher checkpoint.

CLI mirror of the reference ``create_student_model.py`` (both torch and flax
variants): maximally-spaced decoder-layer copy with the last layer pinned,
optional encoder shrink, optional ``--max_source_positions`` truncation, then
save + reload + smoke forward pass (reference :194-211).

    python -m distil_whisper_tpu.cli.create_student_model \
        --teacher_checkpoint /path/to/whisper-large-v3 \
        --decoder_layers 2 --save_dir ./distil-large-v3-init
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..models import load_params, save_pretrained
from ..models.whisper import forward
from ..training.student import init_student_from_teacher
from .common import copy_tokenizer_files, logger, setup_logging


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--teacher_checkpoint", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--decoder_layers", type=int, default=2)
    p.add_argument("--encoder_layers", type=int, default=None)
    p.add_argument("--decoder_layers_numbers", type=int, nargs="*",
                   default=None,
                   help="explicit teacher decoder layers to copy")
    p.add_argument("--max_source_positions", type=int, default=None)
    args = p.parse_args(argv)
    setup_logging()

    teacher, teacher_cfg = load_params(args.teacher_checkpoint)
    logger.info("teacher: %d enc / %d dec layers, d_model %d",
                teacher_cfg.encoder_layers, teacher_cfg.decoder_layers,
                teacher_cfg.d_model)

    student, student_cfg = init_student_from_teacher(
        teacher, teacher_cfg,
        decoder_layers=args.decoder_layers,
        encoder_layers=args.encoder_layers,
        decoder_layer_numbers=args.decoder_layers_numbers,
        max_source_positions=args.max_source_positions)

    save_pretrained(student, student_cfg, args.save_dir)
    copy_tokenizer_files(args.teacher_checkpoint, args.save_dir)

    # reload + smoke forward (the reference's inline self-check)
    reloaded, cfg = load_params(args.save_dir)
    mel = jnp.zeros((1, cfg.num_mel_bins, 3000), jnp.float32)
    tokens = jnp.asarray([[cfg.decoder_start_token_id]], jnp.int32)
    logits, _ = forward(reloaded, cfg, mel, tokens)
    assert np.isfinite(np.asarray(logits)).all()
    logger.info("student saved to %s (%d dec layers), smoke forward OK",
                args.save_dir, cfg.decoder_layers)


if __name__ == "__main__":
    main()
