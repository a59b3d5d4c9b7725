"""HF checkpoint <-> native param tree conversion.

Loads ``model.safetensors`` (or sharded variants / ``pytorch_model.bin``) from
a local HF Whisper checkpoint directory into the stacked-layer param layout of
:mod:`.whisper`, and exports back.  The stacking replaces the reference's
runtime scan<->unroll converters (modeling_flax_whisper.py:1312-1458): HF
checkpoints are unrolled on disk, stacked once at load time.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from .params import tree_paths, unflatten_paths

Params = Dict[str, Any]

# (hf tail, ours tail, needs transpose) for linear/ln leaves inside a layer
_LAYER_MAP = [
    ("self_attn.q_proj.weight", "self_attn.q.kernel", True),
    ("self_attn.q_proj.bias", "self_attn.q.bias", False),
    ("self_attn.k_proj.weight", "self_attn.k.kernel", True),
    ("self_attn.k_proj.bias", "self_attn.k.bias", False),  # absent in Whisper
    ("self_attn.v_proj.weight", "self_attn.v.kernel", True),
    ("self_attn.v_proj.bias", "self_attn.v.bias", False),
    ("self_attn.out_proj.weight", "self_attn.out.kernel", True),
    ("self_attn.out_proj.bias", "self_attn.out.bias", False),
    ("self_attn_layer_norm.weight", "self_attn_ln.scale", False),
    ("self_attn_layer_norm.bias", "self_attn_ln.bias", False),
    ("encoder_attn.q_proj.weight", "cross_attn.q.kernel", True),
    ("encoder_attn.q_proj.bias", "cross_attn.q.bias", False),
    ("encoder_attn.k_proj.weight", "cross_attn.k.kernel", True),
    ("encoder_attn.k_proj.bias", "cross_attn.k.bias", False),
    ("encoder_attn.v_proj.weight", "cross_attn.v.kernel", True),
    ("encoder_attn.v_proj.bias", "cross_attn.v.bias", False),
    ("encoder_attn.out_proj.weight", "cross_attn.out.kernel", True),
    ("encoder_attn.out_proj.bias", "cross_attn.out.bias", False),
    ("encoder_attn_layer_norm.weight", "cross_attn_ln.scale", False),
    ("encoder_attn_layer_norm.bias", "cross_attn_ln.bias", False),
    ("fc1.weight", "fc1.kernel", True),
    ("fc1.bias", "fc1.bias", False),
    ("fc2.weight", "fc2.kernel", True),
    ("fc2.bias", "fc2.bias", False),
    ("final_layer_norm.weight", "final_ln.scale", False),
    ("final_layer_norm.bias", "final_ln.bias", False),
]

_TOP_MAP = [
    ("model.encoder.embed_positions.weight", "encoder.pos_emb"),
    ("model.encoder.layer_norm.weight", "encoder.ln_post.scale"),
    ("model.encoder.layer_norm.bias", "encoder.ln_post.bias"),
    ("model.decoder.embed_tokens.weight", "decoder.tok_emb"),
    ("model.decoder.embed_positions.weight", "decoder.pos_emb"),
    ("model.decoder.layer_norm.weight", "decoder.ln.scale"),
    ("model.decoder.layer_norm.bias", "decoder.ln.bias"),
]


def _read_state_dict(path: Path) -> Dict[str, np.ndarray]:
    """Read all tensors from a local HF checkpoint dir as numpy arrays."""
    single = path / "model.safetensors"
    index = path / "model.safetensors.index.json"
    if single.exists() or index.exists():
        from safetensors.numpy import load_file
        if single.exists():
            return dict(load_file(str(single)))
        with open(index) as f:
            shard_names = sorted(set(json.load(f)["weight_map"].values()))
        out: Dict[str, np.ndarray] = {}
        for name in shard_names:
            out.update(load_file(str(path / name)))
        return out
    torch_bin = path / "pytorch_model.bin"
    if torch_bin.exists():
        import torch
        sd = torch.load(str(torch_bin), map_location="cpu", weights_only=True)
        return {k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
                for k, v in sd.items()}
    # Flax msgpack checkpoints (the reference's TPU path) are handled by
    # training.checkpoint, not here.
    raise FileNotFoundError(f"no model.safetensors / pytorch_model.bin in {path}")


def params_from_state_dict(sd: Dict[str, np.ndarray],
                           cfg: WhisperConfig, dtype=jnp.float32) -> Params:
    flat: Dict[str, np.ndarray] = {}
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    def grab(hf_key):
        return np.asarray(sd[hf_key])

    for hf, ours in _TOP_MAP:
        hf = hf.removeprefix("model.")
        if hf in sd:
            flat[ours] = grab(hf)
    for side, n_layers in (("encoder", cfg.encoder_layers),
                           ("decoder", cfg.decoder_layers)):
        # conv stem (encoder only): HF (out, in, k) -> (k, in, out)
        if side == "encoder":
            flat["encoder.conv1.kernel"] = grab("encoder.conv1.weight").transpose(2, 1, 0)
            flat["encoder.conv1.bias"] = grab("encoder.conv1.bias")
            flat["encoder.conv2.kernel"] = grab("encoder.conv2.weight").transpose(2, 1, 0)
            flat["encoder.conv2.bias"] = grab("encoder.conv2.bias")
        for hf_tail, our_tail, transpose in _LAYER_MAP:
            # Keys absent for a side are skipped wholesale: cross-attn in the
            # encoder, k_proj.bias everywhere (Whisper k has no bias).
            per_layer = []
            present = True
            for i in range(n_layers):
                key = f"{side}.layers.{i}.{hf_tail}"
                if key not in sd:
                    present = False
                    break
                w = grab(key)
                per_layer.append(w.T if transpose else w)
            if present:
                flat[f"{side}.layers.{our_tail}"] = np.stack(per_layer)
    tree = unflatten_paths(flat)
    import jax
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), tree)


def load_params(checkpoint_dir: str, cfg: WhisperConfig | None = None,
                dtype=jnp.float32):
    """Load (params, cfg) from a local HF checkpoint directory."""
    path = Path(checkpoint_dir)
    if cfg is None:
        cfg = WhisperConfig.from_pretrained(checkpoint_dir)
    sd = _read_state_dict(path)
    return params_from_state_dict(sd, cfg, dtype), cfg


def state_dict_from_params(params: Params, cfg: WhisperConfig
                           ) -> Dict[str, np.ndarray]:
    """Inverse of :func:`params_from_state_dict` (for HF-format export)."""
    flat = tree_paths(params)
    sd: Dict[str, np.ndarray] = {}

    def put(key, val):
        # ascontiguousarray: transposed views must be materialised — the
        # safetensors writer serialises raw buffers and ignores strides.
        sd[key] = np.ascontiguousarray(np.asarray(val, dtype=np.float32))

    for hf, ours in _TOP_MAP:
        if ours in flat:
            put(hf, flat[ours])
    put("model.encoder.conv1.weight", np.transpose(flat["encoder.conv1.kernel"], (2, 1, 0)))
    put("model.encoder.conv1.bias", flat["encoder.conv1.bias"])
    put("model.encoder.conv2.weight", np.transpose(flat["encoder.conv2.kernel"], (2, 1, 0)))
    put("model.encoder.conv2.bias", flat["encoder.conv2.bias"])
    for side, n_layers in (("encoder", cfg.encoder_layers),
                           ("decoder", cfg.decoder_layers)):
        for hf_tail, our_tail, transpose in _LAYER_MAP:
            key = f"{side}.layers.{our_tail}"
            if key not in flat:
                continue
            stacked = np.asarray(flat[key], dtype=np.float32)
            for i in range(n_layers):
                w = stacked[i]
                put(f"model.{side}.layers.{i}.{hf_tail}", w.T if transpose else w)
    # Tied LM head.
    sd["proj_out.weight"] = sd["model.decoder.embed_tokens.weight"]
    return sd


def save_pretrained(params: Params, cfg: WhisperConfig, path: str) -> None:
    """Export to an HF-compatible checkpoint dir (config.json + safetensors)."""
    from safetensors.numpy import save_file
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    cfg.save_pretrained(path)
    sd = state_dict_from_params(params, cfg)
    # safetensors forbids shared memory; the tied head is its own copy here.
    sd["proj_out.weight"] = sd["proj_out.weight"].copy()
    # metadata format "pt" is required for torch/transformers to load the file.
    save_file(sd, str(p / "model.safetensors"), metadata={"format": "pt"})
