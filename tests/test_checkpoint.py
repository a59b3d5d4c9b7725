"""Checkpoint save/rotate/resume tests (Orbax-backed)."""

import numpy as np
import jax
import jax.numpy as jnp

from distil_whisper_tpu.config import WhisperConfig
from distil_whisper_tpu.models import init_params
from distil_whisper_tpu.training import (
    CheckpointManager, OptimizerConfig, TrainState, make_optimizer,
)

CFG = WhisperConfig(vocab_size=128, num_mel_bins=8, d_model=16,
                    encoder_layers=1, decoder_layers=1,
                    encoder_attention_heads=2, decoder_attention_heads=2,
                    encoder_ffn_dim=32, decoder_ffn_dim=32,
                    max_source_positions=16, max_target_positions=16)


def _state():
    params = init_params(CFG, jax.random.PRNGKey(0))
    opt = OptimizerConfig(total_steps=10, precision="full")
    tx = make_optimizer(opt, params)
    state, tx = TrainState.create(params, opt, tx)
    return state


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    state = _state()
    mgr.save(5, state, metadata={"epoch": 1})
    assert mgr.latest()[0] == 5
    template = jax.tree.map(np.zeros_like, state)
    step, restored = mgr.resume_latest(template)
    assert step == 5
    np.testing.assert_array_equal(
        np.asarray(restored.params["decoder"]["tok_emb"]),
        np.asarray(state.params["decoder"]["tok_emb"]))


def test_rotation(tmp_path):
    mgr = CheckpointManager(str(tmp_path), save_total_limit=2)
    state = _state()
    for step in (1, 2, 3):
        mgr.save(step, state)
    steps = [s for s, _ in mgr.all_checkpoints()]
    assert steps == [2, 3]


def test_best_rotation(tmp_path):
    mgr = CheckpointManager(str(tmp_path), best_total_limit=2)
    state = _state()
    mgr.save_best(1, state, 12.5)
    mgr.save_best(2, state, 10.0)
    mgr.save_best(3, state, 11.0)
    best = mgr.best_checkpoints()
    assert [round(w, 1) for w, _, _ in best] == [10.0, 11.0]
