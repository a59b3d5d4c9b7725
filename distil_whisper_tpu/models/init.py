"""Random initialisation + logical axis trees for the Whisper param layout."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig

Params = Dict[str, Any]


def sinusoidal_positions(length: int, channels: int) -> np.ndarray:
    """OpenAI-Whisper sinusoids (the encoder's fixed position table)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)],
                          axis=1).astype(np.float32)


def init_params(cfg: WhisperConfig, rng: jax.Array,
                dtype=jnp.float32) -> Params:
    """HF-style init (normal, std 0.02) with sinusoidal encoder positions."""
    std = 0.02
    keys = iter(jax.random.split(rng, 64))

    def norm(shape):
        return (std * jax.random.normal(next(keys), shape)).astype(dtype)

    def zeros(shape):
        return jnp.zeros(shape, dtype)

    def ln(*lead):
        return {"scale": jnp.ones(lead + (cfg.d_model,), dtype),
                "bias": zeros(lead + (cfg.d_model,))}

    def attn(n_layers, bias_k=False):
        d = cfg.d_model
        blk = lambda with_bias: (
            {"kernel": norm((n_layers, d, d)), "bias": zeros((n_layers, d))}
            if with_bias else {"kernel": norm((n_layers, d, d))})
        return {"q": blk(True), "k": blk(bias_k), "v": blk(True),
                "out": blk(True)}

    def enc_layers():
        L, d, f = cfg.encoder_layers, cfg.d_model, cfg.encoder_ffn_dim
        return {
            "self_attn": attn(L),
            "self_attn_ln": ln(L),
            "fc1": {"kernel": norm((L, d, f)), "bias": zeros((L, f))},
            "fc2": {"kernel": norm((L, f, d)), "bias": zeros((L, d))},
            "final_ln": ln(L),
        }

    def dec_layers():
        L, d, f = cfg.decoder_layers, cfg.d_model, cfg.decoder_ffn_dim
        return {
            "self_attn": attn(L),
            "self_attn_ln": ln(L),
            "cross_attn": attn(L),
            "cross_attn_ln": ln(L),
            "fc1": {"kernel": norm((L, d, f)), "bias": zeros((L, f))},
            "fc2": {"kernel": norm((L, f, d)), "bias": zeros((L, d))},
            "final_ln": ln(L),
        }

    return {
        "encoder": {
            "conv1": {"kernel": norm((3, cfg.num_mel_bins, cfg.d_model)),
                      "bias": zeros((cfg.d_model,))},
            "conv2": {"kernel": norm((3, cfg.d_model, cfg.d_model)),
                      "bias": zeros((cfg.d_model,))},
            "pos_emb": jnp.asarray(sinusoidal_positions(
                cfg.max_source_positions, cfg.d_model), dtype),
            "layers": enc_layers(),
            "ln_post": ln(),
        },
        "decoder": {
            "tok_emb": norm((cfg.vocab_size, cfg.d_model)),
            "pos_emb": norm((cfg.max_target_positions, cfg.d_model)),
            "layers": dec_layers(),
            "ln": ln(),
        },
    }


# ----------------------------------------------------------------------
# Logical axis annotations (T5X-style; cf. reference layers.py:417-480 and the
# rule table at partitioner.py:509-555).  ``parallel.sharding`` turns these
# into NamedShardings on a device mesh.
# ----------------------------------------------------------------------


def _attn_axes(bias_k=False):
    kern = ("layers", "embed", "joined_kv")
    out_kern = ("layers", "joined_kv", "embed")
    blk = lambda k, with_bias, bias_ax: (
        {"kernel": k, "bias": bias_ax} if with_bias else {"kernel": k})
    return {
        "q": blk(kern, True, ("layers", "joined_kv")),
        "k": blk(kern, bias_k, ("layers", "joined_kv")),
        "v": blk(kern, True, ("layers", "joined_kv")),
        "out": blk(out_kern, True, ("layers", "embed")),
    }


def param_axes(cfg: WhisperConfig) -> Params:
    """Tree of logical-axis tuples, same structure as :func:`init_params`."""
    ln_l = {"scale": ("layers", "embed"), "bias": ("layers", "embed")}
    ln_0 = {"scale": ("embed",), "bias": ("embed",)}
    mlp_l = {
        "fc1": {"kernel": ("layers", "embed", "mlp"), "bias": ("layers", "mlp")},
        "fc2": {"kernel": ("layers", "mlp", "embed"), "bias": ("layers", "embed")},
    }
    return {
        "encoder": {
            "conv1": {"kernel": ("stack", "unmodeled", "embed"), "bias": ("embed",)},
            "conv2": {"kernel": ("stack", "unmodeled", "embed"), "bias": ("embed",)},
            "pos_emb": ("length", "embed"),
            "layers": {"self_attn": _attn_axes(), "self_attn_ln": ln_l,
                       "final_ln": ln_l, **mlp_l},
            "ln_post": ln_0,
        },
        "decoder": {
            "tok_emb": ("vocab", "embed"),
            "pos_emb": ("length", "embed"),
            "layers": {"self_attn": _attn_axes(), "self_attn_ln": ln_l,
                       "cross_attn": _attn_axes(), "cross_attn_ln": ln_l,
                       "final_ln": ln_l, **mlp_l},
            "ln": ln_0,
        },
    }
