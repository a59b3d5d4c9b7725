"""Beam search parity vs HF torch generate(num_beams=K)."""

import numpy as np
import jax.numpy as jnp
import pytest

from distil_whisper_tpu.models import load_params
from distil_whisper_tpu.generation import GenerationOptions
from distil_whisper_tpu.generation.beam import encode_and_beam_search
from tests.test_generate import CFG, VOCAB, EOS, setup  # noqa: F401


def _hf_beam(model, mel, max_new, num_beams):
    """Golden from HF's return_dict path (full sequences incl. the [3, 400]
    prompt HF self-builds).  NB: HF's two beam output paths are mutually
    inconsistent on this model; ours matches the full-sequence path and an
    independent host-side implementation of the algorithm."""
    import torch
    gc = model.generation_config
    gc.begin_suppress_tokens = None
    gc.suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.no_timestamps_token_id = 400
    gc.pad_token_id = 0
    with torch.no_grad():
        out = model.generate(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.tensor([[3], [3]]),
            max_new_tokens=max_new, do_sample=False, num_beams=num_beams,
            return_timestamps=False, length_penalty=1.0,
            return_dict_in_generate=True)
    return out.sequences.numpy()


@pytest.mark.parametrize("num_beams", [2, 4])
def test_beam_parity_vs_hf(setup, num_beams):  # noqa: F811
    model, params, mel = setup
    hf = _hf_beam(model, mel, 16, num_beams)
    # HF's whisper beam path self-inserts <|notimestamps|> (400) after the
    # decoder prompt when return_timestamps=False; align our prompt to it.
    opts = GenerationOptions(max_new_tokens=16)
    out = encode_and_beam_search(params, CFG, jnp.asarray(mel),
                                 jnp.asarray([[3, 400], [3, 400]], jnp.int32),
                                 opts, num_beams=num_beams)
    seqs = np.asarray(out.sequences)
    lens = np.asarray(out.seq_len)
    for b in range(2):
        ours = list(seqs[b][:lens[b]])
        hf_row = list(hf[b])
        hf_end = len(hf_row)
        while hf_end > 1 and hf_row[hf_end - 1] == 0:
            hf_end -= 1
        hf_row = hf_row[:hf_end]
        # align on the first generated token after the [3, 400] prompt
        if hf_row[:2] == [3, 400]:
            hf_row = hf_row[2:]
        ours = ours[2:]
        n = min(len(ours), len(hf_row))
        np.testing.assert_array_equal(ours[:n], hf_row[:n])
        assert abs(len(ours) - len(hf_row)) <= 0


@pytest.mark.parametrize("seed", [11, 23, 57])
def test_beam_parity_multi_seed(tmp_path, seed):
    """Beam parity vs HF across fresh random models + mel seeds (the single
    fixture model exercises one score landscape; tie-breaks and beam swaps
    depend on the weights)."""
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(seed)
    hf_cfg = HFConfig(
        vocab_size=VOCAB, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=96, decoder_ffn_dim=96,
        dropout=0.0, pad_token_id=0, bos_token_id=1, eos_token_id=EOS,
        decoder_start_token_id=3, suppress_tokens=None,
        begin_suppress_tokens=None, forced_decoder_ids=None)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    model.save_pretrained(str(tmp_path / "m"))
    params, _ = load_params(str(tmp_path / "m"), CFG)
    mel = (np.random.default_rng(seed).standard_normal((2, 80, 3000))
           .astype(np.float32) * 0.5)

    hf = _hf_beam(model, mel, 12, 3)
    opts = GenerationOptions(max_new_tokens=12)
    out = encode_and_beam_search(params, CFG, jnp.asarray(mel),
                                 jnp.asarray([[3, 400]] * 2, jnp.int32),
                                 opts, num_beams=3)
    seqs, lens = np.asarray(out.sequences), np.asarray(out.seq_len)
    for b in range(2):
        ours = list(seqs[b][2:lens[b]])
        hf_row = list(hf[b])
        while len(hf_row) > 1 and hf_row[-1] == 0:
            hf_row.pop()
        if hf_row[:2] == [3, 400]:
            hf_row = hf_row[2:]
        np.testing.assert_array_equal(ours, hf_row,
                                      err_msg=f"seed {seed} sample {b}")


def test_beam1_equals_greedy(setup):  # noqa: F811
    from distil_whisper_tpu.generation import encode_and_generate
    _, params, mel = setup
    opts = GenerationOptions(max_new_tokens=12)
    prompt = jnp.asarray([[3], [3]], jnp.int32)
    greedy = encode_and_generate(params, CFG, jnp.asarray(mel), prompt, opts)
    beam = encode_and_beam_search(params, CFG, jnp.asarray(mel), prompt, opts,
                                  num_beams=1)
    for b in range(2):
        g = np.asarray(greedy.sequences)[b][:int(greedy.seq_len[b])]
        s = np.asarray(beam.sequences)[b][:int(beam.seq_len[b])]
        np.testing.assert_array_equal(g, s)


def test_beam_parity_fields(setup):  # noqa: F811
    """sum_logprobs / no_speech_prob parity so beam can join the sequential
    fallback ladder: beam-1 sum_logprobs == greedy's, and no_speech_prob
    matches greedy's SOT-slot probability exactly."""
    from distil_whisper_tpu.generation import encode_and_generate
    _, params, mel = setup
    opts = GenerationOptions(max_new_tokens=12, no_speech_token_id=5)
    prompt = jnp.asarray([[3], [3]], jnp.int32)
    greedy = encode_and_generate(params, CFG, jnp.asarray(mel), prompt, opts)
    beam = encode_and_beam_search(params, CFG, jnp.asarray(mel), prompt, opts,
                                  num_beams=1)
    np.testing.assert_allclose(np.asarray(beam.no_speech_prob),
                               np.asarray(greedy.no_speech_prob), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(beam.sum_logprobs),
                               np.asarray(greedy.sum_logprobs),
                               rtol=1e-4, atol=1e-4)
    # wider beams: sum_logprobs must be >= beam-1's (beam finds higher-prob
    # sequences) and finite
    beam4 = encode_and_beam_search(params, CFG, jnp.asarray(mel), prompt,
                                   opts, num_beams=4)
    assert np.all(np.isfinite(np.asarray(beam4.sum_logprobs)))
    assert np.all(np.asarray(beam4.sum_logprobs)
                  >= np.asarray(beam.sum_logprobs) - 1e-4)
