"""Sharded inference: generate under data+model parallelism must match
single-device outputs (the pjit serving path, 8 virtual devices)."""

import numpy as np
import jax
import jax.numpy as jnp

from distil_whisper_tpu.config import WhisperConfig
from distil_whisper_tpu.models import init_params, param_axes
from distil_whisper_tpu.parallel import make_mesh, shard_params, shard_batch
from distil_whisper_tpu.generation import GenerationOptions, encode_and_generate

CFG = WhisperConfig(
    vocab_size=1902, num_mel_bins=80, d_model=64,
    encoder_layers=2, decoder_layers=2,
    encoder_attention_heads=4, decoder_attention_heads=4,
    encoder_ffn_dim=128, decoder_ffn_dim=128,
    pad_token_id=0, eos_token_id=300, decoder_start_token_id=3,
    begin_suppress_tokens=())


def test_tp_generate_matches_single_device():
    params = init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((4, 80, 3000)), jnp.float32)
    prompt = jnp.full((4, 1), 3, jnp.int32)
    opts = GenerationOptions(max_new_tokens=12, return_timestamps=True,
                             max_initial_timestamp_index=50)

    ref = encode_and_generate(params, CFG, mel, prompt, opts)
    ref_seq = np.asarray(ref.sequences)

    mesh = make_mesh((2, 4))  # dp=2 x tp=4
    sharded = shard_params(params, param_axes(CFG), mesh)
    batch = shard_batch({"mel": mel, "prompt": prompt}, mesh)

    fn = jax.jit(lambda p, m, pr: encode_and_generate(p, CFG, m, pr, opts))
    out = fn(sharded, batch["mel"], batch["prompt"])
    np.testing.assert_array_equal(np.asarray(out.sequences), ref_seq)
    np.testing.assert_allclose(np.asarray(out.sum_logprobs),
                               np.asarray(ref.sum_logprobs), rtol=1e-4)


def test_tp_speculative_matches():
    from distil_whisper_tpu.models.whisper import encode, cross_kv
    from distil_whisper_tpu.generation.speculative import speculative_generate
    from distil_whisper_tpu.training import init_student_from_teacher

    teacher = init_params(CFG, jax.random.PRNGKey(1))
    draft, d_cfg = init_student_from_teacher(teacher, CFG, decoder_layers=1)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((1, 80, 3000)), jnp.float32)
    prompt = jnp.asarray([[3]], jnp.int32)
    opts = GenerationOptions(max_new_tokens=16)

    def run(t, d):
        enc = encode(t["encoder"], CFG, mel)
        tc = cross_kv(t["decoder"], CFG, enc)
        dc = cross_kv(d["decoder"], d_cfg, enc)
        return speculative_generate(t["decoder"], CFG, d["decoder"], d_cfg,
                                    tc, dc, prompt, opts, gamma=3)

    ref = run(teacher, draft)
    mesh = make_mesh((1, 8))
    t_sh = shard_params(teacher, param_axes(CFG), mesh)
    d_sh = shard_params(draft, param_axes(d_cfg), mesh)
    out = jax.jit(run)(t_sh, d_sh)
    np.testing.assert_array_equal(np.asarray(out.sequences),
                                  np.asarray(ref.sequences))


def test_int8_generate_under_tp_matches_unsharded_int8():
    """int8 projections (quantize_encoder/decoder) must compose with the
    dp x tp sharded serving path: quantizing a sharded tree and generating
    over the mesh gives the same tokens as the single-device int8 run."""
    from distil_whisper_tpu.ops.quant import maybe_quantize_encoder

    cfg = CFG.replace(quantize_encoder=True, quantize_decoder=True)
    params = init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((4, 80, 3000)), jnp.float32)
    prompt = jnp.full((4, 1), 3, jnp.int32)
    opts = GenerationOptions(max_new_tokens=10)

    q_ref = maybe_quantize_encoder(params, cfg)
    ref = encode_and_generate(q_ref, cfg, mel, prompt, opts)

    mesh = make_mesh((2, 4))
    sharded = shard_params(params, param_axes(cfg), mesh)
    q_sh = maybe_quantize_encoder(sharded, cfg)  # eager quantize on shards
    batch = shard_batch({"mel": mel, "prompt": prompt}, mesh)
    fn = jax.jit(lambda p, m, pr: encode_and_generate(p, cfg, m, pr, opts))
    out = fn(q_sh, batch["mel"], batch["prompt"])
    np.testing.assert_array_equal(np.asarray(out.sequences),
                                  np.asarray(ref.sequences))
