"""Distillation + fine-tuning step builders (jit/GSPMD-native).

One jitted train step replaces the reference's pmap+psum machinery
(flax/run_distillation.py:1721-1827): arrays are globally sharded over the
mesh, XLA lowers the gradient reduction to ICI all-reduces, and the loss is
normalised by the global token count exactly as the reference's hand-written
``psum`` normalisation.

Shared frozen encoder: when the student's encoder is frozen and matches the
teacher's width, the window is encoded ONCE and both decoders consume the same
encoder states (reference torch :1046-1049 / flax :1628-1644) — on TPU this
halves encoder FLOPs, usually the bulk of the step for 2-layer students.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..models.whisper import encode, decode, forward
from .losses import (cross_entropy, kl_divergence, hidden_state_mse,
                     get_layers_to_supervise)
from .state import TrainState, OptimizerConfig

Params = Any


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    ce_weight: float = 0.8
    kl_weight: float = 1.0
    temperature: float = 2.0
    mse_weight: float = 0.0
    label_smoothing: float = 0.0
    freeze_encoder: bool = True
    share_encoder: bool = True      # student decodes on teacher enc states
    remat: bool = False
    # Chunked CE+KL (losses.chunked_ce_kl): the [B, S, V] student+teacher
    # logits pair never materialises — ~4 GB at bs16/seq256 for large-v3,
    # the difference between bs8 and bs16+ fitting on a 16 GB chip.
    # Only applies on the shared-encoder path without hidden-state MSE.
    loss_chunk_size: int = 0        # 0 = off (exact same math when on)
    # Quantization-aware training (ops/qat.py): 'none' | 'weights' | 'w8a8'.
    # Fake-quantizes the student DECODER's projections/MLP inside the loss
    # (straight-through gradients), so the trained weights serve faithfully
    # on the int8 stack (cfg.quantize_decoder).  'w8a8' also simulates the
    # dynamic per-token activation quantization — the full serving numerics.
    quantize_student: str = "none"


def build_train_step(student_cfg: WhisperConfig, teacher_cfg: WhisperConfig,
                     dcfg: DistillConfig, opt_cfg: OptimizerConfig, tx):
    """Returns ``train_step(state, teacher_params, batch) -> (state, metrics)``.

    batch: input_features [B, M, 3000], decoder_input_ids [B, S],
    labels [B, S] (-100 on prompt/pad), decoder_attention_mask [B, S] opt.
    """
    dtype = opt_cfg.compute_dtype
    share = dcfg.share_encoder and dcfg.freeze_encoder and (
        student_cfg.d_model == teacher_cfg.d_model
        and student_cfg.num_mel_bins == teacher_cfg.num_mel_bins)
    use_mse = dcfg.mse_weight > 0.0
    layer_map = get_layers_to_supervise(
        student_cfg.decoder_layers, teacher_cfg.decoder_layers) if use_mse else ()
    chunked = dcfg.loss_chunk_size > 0 and share and not use_mse

    def compute_losses(params: Params, teacher_params: Params,
                       batch: Dict[str, jnp.ndarray], dropout_rng=None):
        if dcfg.quantize_student != "none":
            # QAT: the student decodes through serve-time int8 numerics with
            # straight-through gradients to the full-precision masters
            # (ops/qat.py).  Fresh scales every step — they track the moving
            # weights.  Scope matches cfg.quantize_decoder; an unfrozen
            # student encoder joins in (a frozen one is PTQ either way).
            from ..ops.qat import fake_quant_student_params
            params = fake_quant_student_params(
                params, dcfg.quantize_student,
                encoder_too=not dcfg.freeze_encoder)
        mel = batch["input_features"]
        dec_in = batch["decoder_input_ids"]
        labels = batch["labels"]
        attn_mask = batch.get("decoder_attention_mask")

        if chunked:
            enc = encode(teacher_params["encoder"], teacher_cfg, mel,
                         dtype=dtype, remat=dcfg.remat, freeze=True)
            t_y, _ = decode(teacher_params["decoder"], teacher_cfg, dec_in,
                            enc=enc, attention_mask=attn_mask, dtype=dtype,
                            skip_logits=True)
            s_y, _ = decode(params["decoder"], student_cfg, dec_in, enc=enc,
                            attention_mask=attn_mask, dtype=dtype,
                            remat=dcfg.remat, dropout_rng=dropout_rng,
                            skip_logits=True)
            from .losses import chunked_ce_kl
            ce_sum, kl_sum, n_tok = chunked_ce_kl(
                s_y, jax.lax.stop_gradient(t_y),
                params["decoder"]["tok_emb"],
                teacher_params["decoder"]["tok_emb"], labels,
                temperature=dcfg.temperature,
                label_smoothing=dcfg.label_smoothing,
                chunk=dcfg.loss_chunk_size)
            n_tok = jnp.maximum(n_tok, 1.0)
            ce = ce_sum / n_tok
            kl = kl_sum / n_tok
            loss = dcfg.ce_weight * ce + dcfg.kl_weight * kl
            return loss, {"ce_loss": ce, "kl_loss": kl, "loss": loss}

        if share:
            enc = encode(teacher_params["encoder"], teacher_cfg, mel,
                         dtype=dtype, remat=dcfg.remat, freeze=True)
            t_out = decode(teacher_params["decoder"], teacher_cfg, dec_in,
                           enc=enc, attention_mask=attn_mask, dtype=dtype,
                           output_hidden_states=use_mse)
            s_out = decode(params["decoder"], student_cfg, dec_in, enc=enc,
                           attention_mask=attn_mask, dtype=dtype,
                           remat=dcfg.remat, output_hidden_states=use_mse,
                           dropout_rng=dropout_rng)
            t_logits, t_hs = t_out[0], (t_out[2] if use_mse else None)
            s_logits, s_hs = s_out[0], (s_out[2] if use_mse else None)
        else:
            t_logits, t_aux = forward(
                teacher_params, teacher_cfg, mel, dec_in,
                decoder_attention_mask=attn_mask, dtype=dtype,
                output_hidden_states=use_mse)
            t_logits = jax.lax.stop_gradient(t_logits)
            s_logits, s_aux = forward(
                params, student_cfg, mel, dec_in,
                decoder_attention_mask=attn_mask, dtype=dtype,
                remat=dcfg.remat, freeze_encoder=dcfg.freeze_encoder,
                output_hidden_states=use_mse, dropout_rng=dropout_rng)
            t_hs = t_aux.get("decoder_hidden_states") if use_mse else None
            s_hs = s_aux.get("decoder_hidden_states") if use_mse else None

        ce_sum, n_tok = cross_entropy(s_logits, labels, dcfg.label_smoothing)
        kl_sum, _ = kl_divergence(t_logits, s_logits, labels, dcfg.temperature)
        n_tok = jnp.maximum(n_tok, 1.0)
        ce = ce_sum / n_tok
        kl = kl_sum / n_tok
        loss = dcfg.ce_weight * ce + dcfg.kl_weight * kl
        metrics = {"ce_loss": ce, "kl_loss": kl}
        if use_mse:
            mse_sum, mse_n = hidden_state_mse(t_hs, s_hs, layer_map, labels)
            mse = mse_sum / jnp.maximum(mse_n, 1.0)
            loss = loss + dcfg.mse_weight * mse
            metrics["mse_loss"] = mse
        metrics["loss"] = loss
        return loss, metrics

    def train_step(state: TrainState, teacher_params: Params,
                   batch: Dict[str, jnp.ndarray], dropout_rng=None):
        grad_fn = jax.value_and_grad(
            lambda p: compute_losses(p, teacher_params, batch, dropout_rng),
            has_aux=True)
        (_, metrics), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads, tx, opt_cfg)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    def eval_step(params: Params, teacher_params: Params,
                  batch: Dict[str, jnp.ndarray]):
        _, metrics = compute_losses(params, teacher_params, batch)
        return metrics

    return train_step, eval_step


def build_finetune_step(cfg: WhisperConfig, opt_cfg: OptimizerConfig, tx,
                        label_smoothing: float = 0.0, remat: bool = False,
                        freeze_encoder: bool = False,
                        quantize_student: str = "none"):
    """Plain CE fine-tuning (reference flax/run_finetuning.py:880-933).

    ``quantize_student`` ('none'|'weights'|'w8a8'): QAT via ops/qat.py —
    the model trains through the int8 serving numerics (encoder included
    when it is unfrozen, since fine-tuning trains the full model)."""
    dtype = opt_cfg.compute_dtype

    def loss_fn(params, batch):
        if quantize_student != "none":
            from ..ops.qat import fake_quant_student_params
            params = fake_quant_student_params(
                params, quantize_student, encoder_too=not freeze_encoder)
        logits, _ = forward(params, cfg, batch["input_features"],
                            batch["decoder_input_ids"],
                            decoder_attention_mask=batch.get("decoder_attention_mask"),
                            dtype=dtype, remat=remat,
                            freeze_encoder=freeze_encoder)
        ce_sum, n_tok = cross_entropy(logits, batch["labels"], label_smoothing)
        loss = ce_sum / jnp.maximum(n_tok, 1.0)
        return loss, {"loss": loss}

    def train_step(state: TrainState, batch):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        new_state = state.apply_gradients(grads, tx, opt_cfg)
        return new_state, metrics

    def eval_step(params, batch):
        return loss_fn(params, batch)[1]

    return train_step, eval_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))
