"""QAT (ops/qat.py): STE fake-quant matches the int8 serving numerics,
gradients flow straight through, the QAT train step descends, and a
QAT-trained student evaluates identically under real int8 serving."""

import numpy as np
import jax
import jax.numpy as jnp

from distil_whisper_tpu.config import WhisperConfig
from distil_whisper_tpu.models import init_params
from distil_whisper_tpu.models.whisper import decode, dense
from distil_whisper_tpu.ops.qat import (
    fake_quant_acts, fake_quant_dense, fake_quant_student_params,
    fake_quant_weight)
from distil_whisper_tpu.ops.quant import (
    dense_int8, quantize_decoder_params, quantize_dense, quantize_weight)
from distil_whisper_tpu.training import (
    DistillConfig, OptimizerConfig, TrainState, build_train_step,
    init_student_from_teacher, make_optimizer)

TEACHER_CFG = WhisperConfig(
    vocab_size=512, num_mel_bins=80, d_model=64,
    encoder_layers=2, decoder_layers=4,
    encoder_attention_heads=4, decoder_attention_heads=4,
    encoder_ffn_dim=96, decoder_ffn_dim=96)


def _batch(bsz=2, seq=12, vocab=512, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, vocab, (bsz, seq))
    labels[:, :3] = -100
    return {
        "input_features": jnp.asarray(
            rng.standard_normal((bsz, 80, 3000)), jnp.float32),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, vocab, (bsz, seq)), jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
    }


def test_fake_quant_weight_value_and_gradient():
    """Forward value == dequantized int8 weight; gradient == identity."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    q, s = quantize_weight(w)
    np.testing.assert_array_equal(np.asarray(fake_quant_weight(w)),
                                  np.asarray(q.astype(jnp.float32) * s))
    g = jax.grad(lambda k: jnp.sum(fake_quant_weight(k) * 3.0))(w)
    np.testing.assert_allclose(np.asarray(g), 3.0, rtol=1e-6)


def test_fake_quant_acts_value_and_gradient():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    fq = fake_quant_acts(x)
    # quantized to <= 127 levels per row, but close to the original
    np.testing.assert_allclose(np.asarray(fq), np.asarray(x),
                               atol=float(jnp.max(jnp.abs(x))) / 127.0)
    g = jax.grad(lambda a: jnp.sum(fake_quant_acts(a) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), 2.0, rtol=1e-6)


def test_w8a8_fake_quant_dense_matches_int8_path():
    """dense(fake-quant tree) == dense_int8(quantized tree) up to fp
    rounding of the dequantized operands — the train/serve numerics match."""
    rng = np.random.default_rng(2)
    p = {"kernel": jnp.asarray(rng.standard_normal((48, 24)), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal((24,)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((6, 48)), jnp.float32)
    y_serve = dense_int8(quantize_dense(p), x)
    y_train = dense(fake_quant_dense(p, acts=True), x)
    np.testing.assert_allclose(np.asarray(y_train), np.asarray(y_serve),
                               rtol=2e-5, atol=2e-5)


def test_qat_forward_matches_int8_serving_forward():
    """Teacher-forced logits through the QAT (w8a8) tree == logits through
    the REAL int8 decoder (quantize_decoder_params) to fp rounding."""
    teacher = init_params(TEACHER_CFG, jax.random.PRNGKey(0))
    student, s_cfg = init_student_from_teacher(teacher, TEACHER_CFG,
                                               decoder_layers=2)
    batch = _batch()
    from distil_whisper_tpu.models.whisper import encode
    enc = encode(student["encoder"], s_cfg, batch["input_features"])

    qat_tree = fake_quant_student_params(student, "w8a8")
    logits_qat, _ = decode(qat_tree["decoder"], s_cfg,
                           batch["decoder_input_ids"], enc=enc)
    int8_dec = quantize_decoder_params(student["decoder"])
    logits_int8, _ = decode(int8_dec, s_cfg,
                            batch["decoder_input_ids"], enc=enc)
    np.testing.assert_allclose(np.asarray(logits_qat),
                               np.asarray(logits_int8),
                               rtol=1e-3, atol=1e-3)


def test_qat_train_step_descends_and_serves():
    """Ten QAT (w8a8) steps reduce the loss; the trained student then runs
    the real int8 serving path, and its int8-eval loss equals its QAT-eval
    loss (train numerics == serve numerics, end to end)."""
    teacher = init_params(TEACHER_CFG, jax.random.PRNGKey(0))
    student, s_cfg = init_student_from_teacher(teacher, TEACHER_CFG,
                                               decoder_layers=2)
    opt_cfg = OptimizerConfig(learning_rate=3e-3, warmup_steps=1,
                              total_steps=20, precision="full",
                              frozen_prefixes=("encoder",))
    tx = make_optimizer(opt_cfg, student)
    state, tx = TrainState.create(student, opt_cfg, tx)
    dcfg = DistillConfig(freeze_encoder=True, share_encoder=True,
                         quantize_student="w8a8")
    train_step, eval_step = build_train_step(s_cfg, TEACHER_CFG, dcfg,
                                             opt_cfg, tx)
    jit_step = jax.jit(train_step)
    batch = _batch(bsz=4)
    losses = []
    for _ in range(10):
        state, metrics = jit_step(state, teacher, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses

    # QAT-eval loss == int8-serving-eval loss on the trained weights:
    # evaluate CE through both paths and compare.
    from distil_whisper_tpu.models.whisper import encode
    from distil_whisper_tpu.training.losses import cross_entropy
    enc = encode(state.params["encoder"], s_cfg, batch["input_features"])
    qat_tree = fake_quant_student_params(state.params, "w8a8")
    logits_qat, _ = decode(qat_tree["decoder"], s_cfg,
                           batch["decoder_input_ids"], enc=enc)
    int8_dec = quantize_decoder_params(state.params["decoder"])
    logits_int8, _ = decode(int8_dec, s_cfg,
                            batch["decoder_input_ids"], enc=enc)
    ce_qat, n = cross_entropy(logits_qat, batch["labels"])
    ce_int8, _ = cross_entropy(logits_int8, batch["labels"])
    np.testing.assert_allclose(float(ce_qat) / float(n),
                               float(ce_int8) / float(n), rtol=1e-3)


def test_qat_weights_mode_and_chunked_loss():
    """weights-only mode + chunked CE/KL compose: step runs, loss finite,
    frozen encoder untouched, tok_emb stays exact (not fake-quantized)."""
    teacher = init_params(TEACHER_CFG, jax.random.PRNGKey(0))
    student, s_cfg = init_student_from_teacher(teacher, TEACHER_CFG,
                                               decoder_layers=2)
    opt_cfg = OptimizerConfig(learning_rate=1e-3, warmup_steps=0,
                              total_steps=10, precision="full",
                              frozen_prefixes=("encoder",))
    tx = make_optimizer(opt_cfg, student)
    state, tx = TrainState.create(student, opt_cfg, tx)
    dcfg = DistillConfig(freeze_encoder=True, share_encoder=True,
                         quantize_student="weights", loss_chunk_size=8)
    train_step, _ = build_train_step(s_cfg, TEACHER_CFG, dcfg, opt_cfg, tx)
    jit_step = jax.jit(train_step)
    batch = _batch(bsz=2)
    state2, metrics = jit_step(state, teacher, batch)
    assert np.isfinite(float(metrics["loss"]))
    # decoder moved, embedding trained as usual, frozen encoder untouched
    assert not np.array_equal(
        np.asarray(state2.params["decoder"]["layers"]["fc1"]["kernel"]),
        np.asarray(student["decoder"]["layers"]["fc1"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(state2.params["encoder"]["conv1"]["kernel"]),
        np.asarray(student["encoder"]["conv1"]["kernel"]))


def test_flash_encoder_qat_matches_int8_fused_path():
    """fused_self_attention on a QAT (w8a8) tree == the int8 fused serve
    path to fp rounding, and gradients flow (STE) — the flash-encoder
    training forward stays on the serve numerics."""
    from distil_whisper_tpu.ops.encoder_attention import fused_self_attention
    from distil_whisper_tpu.ops.quant import quantize_dense
    rng = np.random.default_rng(3)
    dm, h, t, b = 64, 4, 128, 2

    def mk(bias=True):
        p = {"kernel": jnp.asarray(rng.standard_normal((dm, dm)) * 0.1,
                                   jnp.float32)}
        if bias:
            p["bias"] = jnp.asarray(rng.standard_normal((dm,)) * 0.01,
                                    jnp.float32)
        return p

    attn = {"q": mk(), "k": mk(bias=False), "v": mk(), "out": mk()}
    x = jnp.asarray(rng.standard_normal((b, t, dm)), jnp.float32)
    qat_tree = {n: fake_quant_dense(p, acts=True) for n, p in attn.items()}
    int8_tree = {n: quantize_dense(p) for n, p in attn.items()}
    y_qat = fused_self_attention(qat_tree, x, h, t, interpret=True)
    y_int8 = fused_self_attention(int8_tree, x, h, t, interpret=True)
    np.testing.assert_allclose(np.asarray(y_qat), np.asarray(y_int8),
                               rtol=2e-3, atol=2e-3)
    g = jax.grad(lambda xx: jnp.sum(
        fused_self_attention(qat_tree, xx, h, t, interpret=True)))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_qat_finetune_step_full_model():
    """Fine-tuning QAT (w8a8, unfrozen encoder): the ENCODER fake-quant path
    runs too; loss descends and the encoder's int8-serving forward matches
    the QAT forward on the trained weights."""
    from distil_whisper_tpu.models.whisper import encode
    from distil_whisper_tpu.ops.qat import fake_quant_encoder_params
    from distil_whisper_tpu.ops.quant import quantize_encoder_params
    from distil_whisper_tpu.training import build_finetune_step
    cfg = TEACHER_CFG
    params = init_params(cfg, jax.random.PRNGKey(1))
    opt_cfg = OptimizerConfig(learning_rate=1e-3, warmup_steps=0,
                              total_steps=10, precision="full")
    tx = make_optimizer(opt_cfg, params)
    state, tx = TrainState.create(params, opt_cfg, tx)
    train_step, _ = build_finetune_step(cfg, opt_cfg, tx,
                                        quantize_student="w8a8")
    jit_step = jax.jit(train_step)
    batch = _batch(bsz=2)
    state, m1 = jit_step(state, batch)
    for _ in range(5):
        state, m2 = jit_step(state, batch)
    assert float(m2["loss"]) < float(m1["loss"])

    enc_qat = encode(fake_quant_encoder_params(state.params["encoder"]),
                     cfg, batch["input_features"])
    enc_int8 = encode(quantize_encoder_params(state.params["encoder"]),
                      cfg, batch["input_features"])
    np.testing.assert_allclose(np.asarray(enc_qat), np.asarray(enc_int8),
                               rtol=2e-3, atol=2e-3)


def test_qat_sharded_train_step_matches_single_device():
    """QAT (w8a8) step over a ('data','model') mesh == single-device: the
    fake-quant absmax reductions run over model-axis-sharded kernels under
    GSPMD without changing the math."""
    from distil_whisper_tpu.models.init import param_axes
    from distil_whisper_tpu.parallel import (make_mesh, shard_batch,
                                             shard_params)
    mesh = make_mesh((4, 2))
    teacher = init_params(TEACHER_CFG, jax.random.PRNGKey(0))
    student, s_cfg = init_student_from_teacher(teacher, TEACHER_CFG,
                                               decoder_layers=2)
    opt_cfg = OptimizerConfig(learning_rate=1e-3, warmup_steps=1,
                              total_steps=10, precision="full",
                              frozen_prefixes=("encoder",))
    dcfg = DistillConfig(freeze_encoder=True, share_encoder=True,
                         quantize_student="w8a8")
    batch = _batch(bsz=8)

    teacher_sh = shard_params(teacher, param_axes(TEACHER_CFG), mesh)
    student_sh = shard_params(student, param_axes(s_cfg), mesh)
    tx = make_optimizer(opt_cfg, student_sh)
    state, tx = TrainState.create(student_sh, opt_cfg, tx)
    train_step, _ = build_train_step(s_cfg, TEACHER_CFG, dcfg, opt_cfg, tx)
    _, metrics = jax.jit(train_step)(state, teacher_sh,
                                     shard_batch(batch, mesh))
    sharded_loss = float(metrics["loss"])

    tx1 = make_optimizer(opt_cfg, student)
    state1, tx1 = TrainState.create(student, opt_cfg, tx1)
    step1, _ = build_train_step(s_cfg, TEACHER_CFG, dcfg, opt_cfg, tx1)
    _, metrics1 = jax.jit(step1)(state1, teacher, batch)
    np.testing.assert_allclose(sharded_loss, float(metrics1["loss"]),
                               rtol=2e-4)


def test_qat_composes_with_int8_teacher():
    """--quantize_student w8a8 + --teacher_precision int8 in ONE step (the
    launcher's recommended combination): runs, finite, descends."""
    from distil_whisper_tpu.ops.quant import quantize_teacher_params
    teacher = init_params(TEACHER_CFG, jax.random.PRNGKey(0))
    student, s_cfg = init_student_from_teacher(teacher, TEACHER_CFG,
                                               decoder_layers=2)
    teacher8 = quantize_teacher_params(teacher)
    opt_cfg = OptimizerConfig(learning_rate=3e-3, warmup_steps=1,
                              total_steps=20, precision="full",
                              frozen_prefixes=("encoder",))
    tx = make_optimizer(opt_cfg, student)
    state, tx = TrainState.create(student, opt_cfg, tx)
    dcfg = DistillConfig(freeze_encoder=True, share_encoder=True,
                         quantize_student="w8a8")
    train_step, _ = build_train_step(s_cfg, TEACHER_CFG, dcfg, opt_cfg, tx)
    jit_step = jax.jit(train_step)
    batch = _batch(bsz=2)
    losses = []
    for _ in range(6):
        state, metrics = jit_step(state, teacher8, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_fake_quant_tree_preserves_structure():
    """The QAT tree keeps {kernel, bias} names/shapes (plus the act_fq
    marker), so grads map one-to-one onto the master params."""
    teacher = init_params(TEACHER_CFG, jax.random.PRNGKey(0))
    student, _ = init_student_from_teacher(teacher, TEACHER_CFG,
                                           decoder_layers=2)
    tree = fake_quant_student_params(student, "w8a8")
    lyr = tree["decoder"]["layers"]
    for name in ("q", "k", "v", "out"):
        src = student["decoder"]["layers"]["self_attn"][name]
        want = {"kernel", "act_fq"} | ({"bias"} if "bias" in src else set())
        assert set(lyr["self_attn"][name]) == want  # k has no bias (Whisper)
        assert lyr["self_attn"][name]["kernel"].shape == src["kernel"].shape
    # tied embedding unchanged (int8 lm head is a separate opt-in)
    np.testing.assert_array_equal(np.asarray(tree["decoder"]["tok_emb"]),
                                  np.asarray(student["decoder"]["tok_emb"]))
    # weights-only mode: no act marker
    tree_w = fake_quant_student_params(student, "weights")
    assert "act_fq" not in tree_w["decoder"]["layers"]["fc1"]
