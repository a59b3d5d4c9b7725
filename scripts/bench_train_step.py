"""On-chip distillation train-step throughput: large-v3 teacher ->
distil-large-v3 student (frozen shared encoder, half_mixed, remat).

Reports steps/s and training audio-hours/hour (= bs * 30 s per step).
Env: TRAIN_BS (default 8), TRAIN_SEQ (default 256),
TRAIN_TEACHER_PREC: comma-separated variants "prec" or "prec+qat" where
prec in {train, inference, int8} (the --teacher_precision knob of
cli/run_distillation.py: the teacher side of the step is pure inference,
so it can ride the bf16-fast / int8 stack) and qat in {weights, w8a8}
(the --quantize_student knob: STE fake-quant of the student's decoder,
ops/qat.py).  e.g. TRAIN_TEACHER_PREC="int8,int8+w8a8".  Multiple variants
are timed in ONE process so the comparison cancels run-to-run chip drift
(docs/PERFORMANCE.md rule 1).
"""

import json
import os
import time

import numpy as np


def time_prec(variant, bs, seq, chunk):
    prec, _, qat = variant.partition("+")
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.training import (
        DistillConfig, OptimizerConfig, TrainState, build_train_step,
        init_student_from_teacher, make_optimizer)

    t_cfg = PRESETS["large-v3"]
    teacher = init_params(t_cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    student, s_cfg = init_student_from_teacher(teacher, t_cfg,
                                               decoder_layers=2)
    if prec != "train":
        # teacher-only fast paths; the student keeps exact training numerics
        t_cfg = t_cfg.replace(fast_bf16_attention=True,
                              use_flash_encoder=True)
        if prec == "int8":
            from distil_whisper_tpu.ops.quant import quantize_teacher_params
            teacher = quantize_teacher_params(teacher)
    opt_cfg = OptimizerConfig(learning_rate=1e-4, warmup_steps=10,
                              total_steps=1000, precision="half_mixed",
                              frozen_prefixes=("encoder",))
    tx = make_optimizer(opt_cfg, student)
    state, tx = TrainState.create(student, opt_cfg, tx)
    del student
    dcfg = DistillConfig(freeze_encoder=True, share_encoder=True, remat=True,
                         loss_chunk_size=chunk,
                         quantize_student=qat or "none")
    train_step, _ = build_train_step(s_cfg, t_cfg, dcfg, opt_cfg, tx)
    jit_step = jax.jit(train_step, donate_argnums=(0,))

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 40000, (bs, seq))
    labels[:, :4] = -100
    batch = {
        "input_features": jnp.asarray(
            rng.standard_normal((bs, t_cfg.num_mel_bins, 3000)), jnp.float32),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, 40000, (bs, seq)), jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
    }

    t0 = time.perf_counter()
    state, metrics = jit_step(state, teacher, batch)
    np.asarray(metrics["loss"])
    compile_s = time.perf_counter() - t0
    print(f"[{variant}] compile+first step: {compile_s:.0f}s loss="
          f"{float(metrics['loss']):.3f}", flush=True)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = jit_step(state, teacher, batch)
        np.asarray(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"[{variant}] {dt*1e3:.1f} ms/step", flush=True)
    return dt


def main():
    bs = int(os.environ.get("TRAIN_BS", "8"))
    seq = int(os.environ.get("TRAIN_SEQ", "256"))
    chunk = int(os.environ.get("TRAIN_CHUNK", "0"))
    precs = os.environ.get("TRAIN_TEACHER_PREC", "train").split(",")

    out = {"train_bs": bs, "label_seq": seq, "loss_chunk": chunk,
           "variants": {}}
    for prec in precs:
        dt = time_prec(prec, bs, seq, chunk)
        out["variants"][prec] = {
            "steps_per_second": round(1 / dt, 3),
            "step_ms": round(dt * 1e3, 1),
            "train_audio_s_per_s": round(bs * 30.0 / dt, 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
