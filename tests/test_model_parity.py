"""Forward-pass parity vs HF torch Whisper on a tiny random checkpoint.

A tiny random ``WhisperForConditionalGeneration`` is created locally (no
network), saved, loaded with our safetensors loader, and compared logit-for-
logit — the strongest correctness evidence available offline (SURVEY.md §4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from distil_whisper_tpu.config import WhisperConfig
from distil_whisper_tpu.models import (
    load_params, forward, encode, decode, init_cache, cross_kv, save_pretrained,
)

CFG = WhisperConfig(
    vocab_size=1000, num_mel_bins=80, d_model=64,
    encoder_layers=2, decoder_layers=3,
    encoder_attention_heads=4, decoder_attention_heads=4,
    encoder_ffn_dim=96, decoder_ffn_dim=96,
    max_source_positions=1500, max_target_positions=448,
    pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
    begin_suppress_tokens=(),
)


@pytest.fixture(scope="module")
def hf_model(tmp_path_factory):
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration
    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size, num_mel_bins=CFG.num_mel_bins,
        d_model=CFG.d_model, encoder_layers=CFG.encoder_layers,
        decoder_layers=CFG.decoder_layers,
        encoder_attention_heads=CFG.encoder_attention_heads,
        decoder_attention_heads=CFG.decoder_attention_heads,
        encoder_ffn_dim=CFG.encoder_ffn_dim, decoder_ffn_dim=CFG.decoder_ffn_dim,
        max_source_positions=CFG.max_source_positions,
        max_target_positions=CFG.max_target_positions,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3, suppress_tokens=None, begin_suppress_tokens=None,
        forced_decoder_ids=None,
    )
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    path = tmp_path_factory.mktemp("ckpt") / "tiny"
    model.save_pretrained(str(path))
    return model, str(path)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32)
    tokens = rng.integers(0, 1000, size=(2, 12)).astype(np.int64)
    return mel, tokens


def test_forward_parity(hf_model, batch):
    import torch
    model, path = hf_model
    mel, tokens = batch
    params, cfg = load_params(path, CFG)

    with torch.no_grad():
        out = model(input_features=torch.from_numpy(mel),
                    decoder_input_ids=torch.from_numpy(tokens),
                    output_hidden_states=True)
    golden = out.logits.numpy()
    golden_enc = out.encoder_last_hidden_state.numpy()

    logits, aux = forward(params, cfg, jnp.asarray(mel), jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(aux["encoder_last_hidden_state"]),
                               golden_enc, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logits), golden, atol=5e-4, rtol=1e-3)


def test_hidden_states_parity(hf_model, batch):
    import torch
    model, path = hf_model
    mel, tokens = batch
    params, cfg = load_params(path, CFG)

    with torch.no_grad():
        out = model(input_features=torch.from_numpy(mel),
                    decoder_input_ids=torch.from_numpy(tokens),
                    output_hidden_states=True)

    logits, aux = forward(params, cfg, jnp.asarray(mel), jnp.asarray(tokens),
                          output_hidden_states=True)
    dec_hs = np.asarray(aux["decoder_hidden_states"])  # [L+1, B, S, D]
    assert dec_hs.shape[0] == CFG.decoder_layers + 1
    for i, hf_hs in enumerate(out.decoder_hidden_states):
        # HF's list is [emb, layer1, ..., layerL]; ours matches that order —
        # except HF's last entry is *before* the final LN?  No: HF applies the
        # final layer_norm to the last hidden state.  Compare exactly.
        got = dec_hs[i]
        want = hf_hs.numpy()
        if i == CFG.decoder_layers:
            np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
        else:
            np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_cached_decode_matches_uncached(hf_model, batch):
    """KV-cache equivalence: step-by-step cached decode == one-shot decode."""
    mel, tokens = batch
    _, path = hf_model
    params, cfg = load_params(path, CFG)
    dec = params["decoder"]

    enc = encode(params["encoder"], cfg, jnp.asarray(mel))
    full_logits, _ = decode(dec, cfg, jnp.asarray(tokens), enc=enc)

    cross = cross_kv(dec, cfg, enc)
    cache = init_cache(cfg, batch=2)
    step_logits = []
    for t in range(tokens.shape[1]):
        lg, cache = decode(dec, cfg, jnp.asarray(tokens[:, t:t + 1]),
                           cross=cross, cache=cache, pos_offset=t)
        step_logits.append(np.asarray(lg[:, 0]))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits),
                               atol=2e-4, rtol=1e-3)


def test_prefill_then_step(hf_model, batch):
    """Multi-token prefill + single-token continuation == one-shot decode."""
    mel, tokens = batch
    _, path = hf_model
    params, cfg = load_params(path, CFG)
    dec = params["decoder"]

    enc = encode(params["encoder"], cfg, jnp.asarray(mel))
    full_logits, _ = decode(dec, cfg, jnp.asarray(tokens), enc=enc)

    cross = cross_kv(dec, cfg, enc)
    cache = init_cache(cfg, batch=2)
    split = 7
    lg1, cache = decode(dec, cfg, jnp.asarray(tokens[:, :split]),
                        cross=cross, cache=cache, pos_offset=0)
    lg2, cache = decode(dec, cfg, jnp.asarray(tokens[:, split:]),
                        cross=cross, cache=cache, pos_offset=split)
    got = np.concatenate([np.asarray(lg1), np.asarray(lg2)], axis=1)
    np.testing.assert_allclose(got, np.asarray(full_logits), atol=2e-4, rtol=1e-3)


def test_save_roundtrip(hf_model, batch, tmp_path):
    """Our HF export reloads in torch with identical weights."""
    import torch
    from transformers import WhisperForConditionalGeneration
    model, path = hf_model
    mel, tokens = batch
    params, cfg = load_params(path, CFG)
    out_dir = tmp_path / "export"
    save_pretrained(params, cfg, str(out_dir))
    reloaded = WhisperForConditionalGeneration.from_pretrained(str(out_dir)).eval()
    with torch.no_grad():
        a = model(input_features=torch.from_numpy(mel),
                  decoder_input_ids=torch.from_numpy(tokens)).logits
        b = reloaded(input_features=torch.from_numpy(mel),
                     decoder_input_ids=torch.from_numpy(tokens)).logits
    np.testing.assert_allclose(a.numpy(), b.numpy(), atol=1e-5)


def test_remat_matches(hf_model, batch):
    mel, tokens = batch
    _, path = hf_model
    params, cfg = load_params(path, CFG)
    a, _ = forward(params, cfg, jnp.asarray(mel), jnp.asarray(tokens))
    b, _ = forward(params, cfg, jnp.asarray(mel), jnp.asarray(tokens), remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dropout_training_mode(hf_model, batch):
    """Dropout only activates with an rng + nonzero rates; inference exact."""
    import dataclasses
    mel, tokens = batch
    _, path = hf_model
    params, cfg = load_params(path, CFG)
    dcfg = cfg.replace(dropout=0.3, activation_dropout=0.1,
                       attention_dropout=0.1)
    import jax
    base, _ = forward(params, cfg, jnp.asarray(mel), jnp.asarray(tokens))
    # rates set but no rng -> inference, identical
    infer, _ = forward(params, dcfg, jnp.asarray(mel), jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(base), np.asarray(infer), atol=1e-6)
    # rng + rates -> stochastic output, deterministic per key
    a, _ = forward(params, dcfg, jnp.asarray(mel), jnp.asarray(tokens),
                   dropout_rng=jax.random.PRNGKey(0))
    b, _ = forward(params, dcfg, jnp.asarray(mel), jnp.asarray(tokens),
                   dropout_rng=jax.random.PRNGKey(0))
    c, _ = forward(params, dcfg, jnp.asarray(mel), jnp.asarray(tokens),
                   dropout_rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert np.abs(np.asarray(a) - np.asarray(base)).max() > 1e-3
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3


def test_fast_policies_still_decode_consistently(hf_model, batch):
    """Fast inference policies must keep greedy decisions stable on this
    model (smoke guard — WER validation is per-deployment)."""
    from distil_whisper_tpu.generation import GenerationOptions, encode_and_generate
    mel, _ = batch
    _, path = hf_model
    params, cfg = load_params(path, CFG)
    opts = GenerationOptions(max_new_tokens=10)
    prompt = jnp.asarray([[3], [3]], jnp.int32)
    ref = encode_and_generate(params, cfg, jnp.asarray(mel), prompt, opts)
    fast_cfg = cfg.replace(fast_bf16_attention=True,
                           fast_approx_activations=True)
    fast = encode_and_generate(params, fast_cfg, jnp.asarray(mel), prompt, opts)
    # fp32 params: fast_bf16_attention is exact; approx activations may only
    # flip rare near-ties
    agree = np.mean(np.asarray(ref.sequences) == np.asarray(fast.sequences))
    assert agree >= 0.9, agree
