"""QAT vs PTQ on a tiny model: does training through the int8 numerics
actually shrink the quantized-serving gap?

Twin students (identical init/data/seed) distilled for N steps, one plain
and one with --quantize_student w8a8, then both evaluated teacher-forced
through (a) the exact path and (b) the real int8 decoder
(`quantize_decoder_params`).  Reported per model:

    ptq_gap = CE(int8 serve) - CE(exact serve)

For the QAT model the serve-time numerics ARE the train-time numerics, so
its int8 CE is its native operating point (tests/test_qat.py pins the
equality); the question this demo answers is how the two models compare
when both are served int8 — the deployment decision.

Tiny-model caveat: absolute CE gaps here say nothing about real-checkpoint
WER (zero-egress sandbox, random init); the demo shows the MECHANISM on
the real code path.  Runs on CPU in ~2 min:

    JAX_DEMO_STEPS=300 python scripts/demo_qat_vs_ptq.py
"""

import json
import os

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from distil_whisper_tpu.config import WhisperConfig
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.models.whisper import decode, encode
    from distil_whisper_tpu.ops.quant import quantize_decoder_params
    from distil_whisper_tpu.training import (
        DistillConfig, OptimizerConfig, TrainState, build_train_step,
        init_student_from_teacher, make_optimizer)
    from distil_whisper_tpu.training.losses import cross_entropy

    steps = int(os.environ.get("JAX_DEMO_STEPS", "300"))
    t_cfg = WhisperConfig(
        vocab_size=512, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=4,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=96, decoder_ffn_dim=96)
    teacher = init_params(t_cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    bsz, seq = 8, 24
    labels = rng.integers(0, 512, (bsz, seq))
    labels[:, :3] = -100
    batch = {
        "input_features": jnp.asarray(
            rng.standard_normal((bsz, 80, 3000)), jnp.float32),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, 512, (bsz, seq)), jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
    }

    def train(qat_mode):
        student, s_cfg = init_student_from_teacher(teacher, t_cfg,
                                                   decoder_layers=2)
        opt_cfg = OptimizerConfig(learning_rate=3e-3, warmup_steps=10,
                                  total_steps=steps, precision="full",
                                  frozen_prefixes=("encoder",))
        tx = make_optimizer(opt_cfg, student)
        state, tx = TrainState.create(student, opt_cfg, tx)
        dcfg = DistillConfig(freeze_encoder=True, share_encoder=True,
                             quantize_student=qat_mode)
        step, _ = build_train_step(s_cfg, t_cfg, dcfg, opt_cfg, tx)
        jit_step = jax.jit(step, donate_argnums=(0,))
        metrics = {"loss": float("nan")}
        for _ in range(steps):
            state, metrics = jit_step(state, teacher, batch)
        return state.params, s_cfg, float(metrics["loss"])

    def serve_ce(params, s_cfg, int8):
        enc = encode(params["encoder"], s_cfg, batch["input_features"])
        dec = quantize_decoder_params(params["decoder"]) if int8 \
            else params["decoder"]
        logits, _ = decode(dec, s_cfg, batch["decoder_input_ids"], enc=enc)
        ce, n = cross_entropy(logits, batch["labels"])
        return float(ce) / float(n)

    out = {"steps": steps}
    for mode in ("none", "w8a8"):
        params, s_cfg, final_loss = train(mode)
        exact = serve_ce(params, s_cfg, int8=False)
        int8 = serve_ce(params, s_cfg, int8=True)
        out[mode] = {"train_loss": round(final_loss, 4),
                     "ce_exact_serve": round(exact, 4),
                     "ce_int8_serve": round(int8, 4),
                     "ptq_gap": round(int8 - exact, 5)}
        print(f"[{mode}] train_loss={final_loss:.4f} exact={exact:.4f} "
              f"int8={int8:.4f} gap={int8 - exact:+.5f}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
