"""Student initialisation from a teacher (create_student_model equivalent).

Copies the full encoder and a maximally-spaced subset of decoder layers
(first/last pinned via ``np.linspace``, reference
training/create_student_model.py:129-144).  With stacked-layer params this is
a single gather along the ``layers`` axis.  Supports the reference's
``--max_source_positions`` truncation for 15 s-context experiments
(flax/create_student_model.py:66-71) and explicit layer picks.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig

Params = Any


def student_layer_map(teacher_layers: int, student_layers: int) -> np.ndarray:
    mapping = np.linspace(0, teacher_layers - 1, student_layers, dtype=np.int64)
    mapping[-1] = teacher_layers - 1  # always keep the final teacher layer
    return mapping


def init_student_from_teacher(
        teacher_params: Params, teacher_cfg: WhisperConfig,
        decoder_layers: int = 2,
        encoder_layers: Optional[int] = None,
        decoder_layer_numbers: Optional[Sequence[int]] = None,
        max_source_positions: Optional[int] = None):
    """Returns (student_params, student_cfg)."""
    enc_l = encoder_layers or teacher_cfg.encoder_layers
    cfg = teacher_cfg.replace(encoder_layers=enc_l,
                              decoder_layers=decoder_layers)

    if decoder_layer_numbers is not None:
        assert len(decoder_layer_numbers) == decoder_layers
        dec_map = np.asarray(decoder_layer_numbers, np.int64)
    else:
        dec_map = student_layer_map(teacher_cfg.decoder_layers, decoder_layers)
    enc_map = (student_layer_map(teacher_cfg.encoder_layers, enc_l)
               if enc_l != teacher_cfg.encoder_layers
               else np.arange(enc_l))

    def take(stacked, idx):
        return jax.tree.map(lambda x: x[jnp.asarray(idx)], stacked)

    def copy_tree(tree):
        # materialise fresh buffers — the student must not alias the teacher
        # (aliasing breaks donation in jitted train steps)
        return jax.tree.map(lambda x: jnp.array(x, copy=True), tree)

    student = {
        "encoder": {**copy_tree({k: v for k, v in teacher_params["encoder"].items()
                                 if k != "layers"}),
                    "layers": take(teacher_params["encoder"]["layers"], enc_map)},
        "decoder": {**copy_tree({k: v for k, v in teacher_params["decoder"].items()
                                 if k != "layers"}),
                    "layers": take(teacher_params["decoder"]["layers"], dec_map)},
    }

    if (max_source_positions is not None
            and max_source_positions != teacher_cfg.max_source_positions):
        cfg = cfg.replace(max_source_positions=max_source_positions)
        student["encoder"]["pos_emb"] = \
            student["encoder"]["pos_emb"][:max_source_positions]
    return student, cfg
