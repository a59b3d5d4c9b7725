"""Generation parity vs HF torch ``generate`` on a tiny random Whisper.

Vocab layout mimics the real Whisper tail: text tokens < eos < specials <
<|notimestamps|> < 1501 timestamp tokens, so the timestamp FSM is exercised
with the same index arithmetic as the real checkpoints
(timestamp_begin = vocab_size - 1501).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from distil_whisper_tpu.config import WhisperConfig
from distil_whisper_tpu.models import load_params
from distil_whisper_tpu.generation import GenerationOptions, encode_and_generate

VOCAB = 1902  # timestamp_begin = 401, <|notimestamps|> = 400
EOS = 300
CFG = WhisperConfig(
    vocab_size=VOCAB, num_mel_bins=80, d_model=64,
    encoder_layers=2, decoder_layers=2,
    encoder_attention_heads=4, decoder_attention_heads=4,
    encoder_ffn_dim=96, decoder_ffn_dim=96,
    pad_token_id=0, bos_token_id=1, eos_token_id=EOS, decoder_start_token_id=3,
    begin_suppress_tokens=(),
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration
    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=VOCAB, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=96, decoder_ffn_dim=96,
        dropout=0.0, pad_token_id=0, bos_token_id=1, eos_token_id=EOS,
        decoder_start_token_id=3, suppress_tokens=None,
        begin_suppress_tokens=None, forced_decoder_ids=None,
    )
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    path = tmp_path_factory.mktemp("gen") / "tiny"
    model.save_pretrained(str(path))
    params, _ = load_params(str(path), CFG)
    rng = np.random.default_rng(7)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.5
    return model, params, mel


def _hf_generate(model, mel, max_new, return_timestamps):
    import torch
    gc = model.generation_config
    gc.begin_suppress_tokens = None
    gc.suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.no_timestamps_token_id = 400
    gc.max_initial_timestamp_index = 50
    gc.pad_token_id = 0
    with torch.no_grad():
        out = model.generate(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.tensor([[3], [3]]),
            max_new_tokens=max_new, do_sample=False,
            return_timestamps=return_timestamps,
        )
    return out.numpy()


def _ours_generate(params, mel, max_new, return_timestamps):
    opts = GenerationOptions(max_new_tokens=max_new,
                             return_timestamps=return_timestamps,
                             max_initial_timestamp_index=50)
    prompt = jnp.asarray([[3], [3]], jnp.int32)
    out = encode_and_generate(params, CFG, jnp.asarray(mel), prompt, opts)
    return np.asarray(out.sequences), np.asarray(out.seq_len), out


def _compare(hf_seq, our_seq, our_len):
    for b in range(hf_seq.shape[0]):
        hf_row = hf_seq[b]
        # HF pads the batch to the longest sequence with pad_token (0)
        hf_end = len(hf_row)
        while hf_end > 1 and hf_row[hf_end - 1] == 0:
            hf_end -= 1
        ours_row = our_seq[b][:our_len[b]]
        # HF whisper generate strips the decoder_input_ids prefix from its
        # output; ours keeps the prompt.  Align on the first generated token.
        if hf_row[0] != ours_row[0]:
            ours_row = ours_row[1:]
        np.testing.assert_array_equal(ours_row, hf_row[:hf_end])


def test_greedy_parity(setup):
    model, params, mel = setup
    hf = _hf_generate(model, mel, 24, return_timestamps=False)
    seq, lens, _ = _ours_generate(params, mel, 24, return_timestamps=False)
    _compare(hf, seq, lens)


def test_greedy_timestamp_parity(setup):
    """HF's return_timestamps path segments + trims at the final complete
    timestamp pair, so its output is a *prefix* of the raw stream — assert
    prefix agreement plus the FSM invariants on our full stream."""
    model, params, mel = setup
    hf = _hf_generate(model, mel, 24, return_timestamps=True)
    seq, lens, _ = _ours_generate(params, mel, 24, return_timestamps=True)
    ts_begin = CFG.timestamp_begin
    for b in range(seq.shape[0]):
        ours = seq[b][1:lens[b]]  # drop prompt
        hf_row = hf[b]
        hf_end = len(hf_row)
        while hf_end > 1 and hf_row[hf_end - 1] == 0:
            hf_end -= 1
        n = min(hf_end, len(ours))
        np.testing.assert_array_equal(ours[:n], hf_row[:n])
        # invariants: initial timestamp within cap; timestamps non-decreasing
        assert ts_begin <= ours[0] <= ts_begin + 50
        ts = [t for t in ours if t >= ts_begin]
        assert ts == sorted(ts)


def test_timestamp_processor_parity_exhaustive(setup):
    """Unit-level pin: our vectorised timestamp rules == HF's torch processor
    on random scores with hand-built histories covering every FSM state."""
    import torch
    from transformers import GenerationConfig
    from transformers.generation.logits_process import WhisperTimeStampLogitsProcessor
    from distil_whisper_tpu.generation.logits import timestamp_rules, TimestampState

    gc = GenerationConfig(eos_token_id=EOS, bos_token_id=1)
    gc.no_timestamps_token_id = 400
    gc.max_initial_timestamp_index = 50
    proc = WhisperTimeStampLogitsProcessor(gc, begin_index=1)

    rng = np.random.default_rng(3)
    ts_begin = 401
    histories = [
        [3],                                # at begin: force initial timestamp
        [3, 410],                           # last is ts, penult n/a -> text
        [3, 410, 17],                       # text after ts
        [3, 410, 17, 433],                  # single new ts -> force ts_or_eos
        [3, 410, 17, 433, 433],             # pair complete -> force text
        [3, 450, 450, 12, 99],              # plain text run with past ts
        [3, 1901, 1901, 12],                # max timestamp reached
    ]
    for hist in histories:
        scores = rng.standard_normal((1, VOCAB)).astype(np.float32)
        golden = proc(torch.tensor([hist]), torch.from_numpy(scores.copy())).numpy()

        gen = hist[1:]
        state = TimestampState(
            prev=jnp.asarray([gen[-1] if len(gen) >= 1 else -1], jnp.int32),
            prevprev=jnp.asarray([gen[-2] if len(gen) >= 2 else -1], jnp.int32),
            last_ts=jnp.asarray([max([t for t in gen if t >= ts_begin], default=0)],
                                jnp.int32),
        )
        ours = np.asarray(timestamp_rules(jnp.asarray(scores), len(gen), state,
                                          CFG, 50))
        golden_inf = np.isneginf(golden)
        ours_inf = np.isneginf(ours)
        np.testing.assert_array_equal(ours_inf, golden_inf,
                                      err_msg=f"mask mismatch for {hist}")
        np.testing.assert_allclose(ours[~ours_inf], golden[~golden_inf],
                                   atol=1e-6)


def test_timestamp_processor_parity_fuzz(setup):
    """Random FSM-reachable histories (random text/timestamp mixes with
    monotone timestamps) through our vectorised timestamp rules vs HF's
    torch processor — the masks must agree on every case.  (On
    non-monotone histories — unreachable, the FSM masks decreasing
    timestamps — the two state summaries legitimately differ: HF keys on
    the LAST timestamp occurrence, ours on the max.)"""
    import random
    import torch
    from transformers import GenerationConfig
    from transformers.generation.logits_process import (
        WhisperTimeStampLogitsProcessor)
    from distil_whisper_tpu.generation.logits import (
        timestamp_rules, TimestampState)

    gc = GenerationConfig(eos_token_id=EOS, bos_token_id=1)
    gc.no_timestamps_token_id = 400
    gc.max_initial_timestamp_index = 50
    proc = WhisperTimeStampLogitsProcessor(gc, begin_index=1)

    nprng = np.random.default_rng(11)
    pyrng = random.Random(11)
    ts_begin = 401
    pool = [3, 12, 17, 99, 250, 399,
            401, 402, 410, 433, 450, 900, 1500, 1900, 1901]
    for case in range(150):
        # histories with MONOTONE timestamps — the only ones the FSM can
        # reach (it masks decreasing timestamps), and the set on which the
        # state summary (prev/prevprev/last_ts) is lossless.  HF keys its
        # increase rule on the LAST timestamp occurrence; with monotone
        # histories last == max, so both summaries agree.
        hist = [3]
        ts_floor = ts_begin
        for _ in range(pyrng.randint(0, 11)):
            tok = pyrng.choice(pool)
            if tok >= ts_begin:
                tok = max(tok, min(ts_floor, 1901))
                ts_floor = tok
            hist.append(tok)
        scores = nprng.standard_normal((1, VOCAB)).astype(np.float32)
        golden = proc(torch.tensor([hist]),
                      torch.from_numpy(scores.copy())).numpy()

        gen = hist[1:]
        state = TimestampState(
            prev=jnp.asarray([gen[-1] if len(gen) >= 1 else -1], jnp.int32),
            prevprev=jnp.asarray([gen[-2] if len(gen) >= 2 else -1],
                                 jnp.int32),
            last_ts=jnp.asarray(
                [max([t for t in gen if t >= ts_begin], default=0)],
                jnp.int32),
        )
        ours = np.asarray(timestamp_rules(jnp.asarray(scores), len(gen),
                                          state, CFG, 50))
        golden_inf = np.isneginf(golden)
        ours_inf = np.isneginf(ours)
        np.testing.assert_array_equal(
            ours_inf, golden_inf, err_msg=f"case {case}: mask mismatch "
                                          f"for history {hist}")
        np.testing.assert_allclose(ours[~ours_inf], golden[~golden_inf],
                                   atol=1e-6)


def test_forced_and_suppress(setup):
    _, params, mel = setup
    opts = GenerationOptions(
        max_new_tokens=8,
        forced_decoder_ids=((1, 37), (2, 42)),
        suppress_tokens=(5, 6, 7),
        begin_suppress_tokens=(9,),
    )
    prompt = jnp.asarray([[3], [3]], jnp.int32)
    out = encode_and_generate(params, CFG, jnp.asarray(mel), prompt, opts)
    seq = np.asarray(out.sequences)
    assert (seq[:, 1] == 37).all() and (seq[:, 2] == 42).all()
    gen = seq[:, 1:]
    assert not np.isin(gen, [5, 6, 7]).any()


def test_sampling_determinism_and_temperature(setup):
    _, params, mel = setup
    opts = GenerationOptions(max_new_tokens=12, do_sample=True)
    prompt = jnp.asarray([[3], [3]], jnp.int32)
    rng = jax.random.PRNGKey(5)
    a = encode_and_generate(params, CFG, jnp.asarray(mel), prompt, opts,
                            temperature=0.8, rng=rng)
    b = encode_and_generate(params, CFG, jnp.asarray(mel), prompt, opts,
                            temperature=0.8, rng=rng)
    np.testing.assert_array_equal(np.asarray(a.sequences), np.asarray(b.sequences))
    c = encode_and_generate(params, CFG, jnp.asarray(mel), prompt, opts,
                            temperature=1.5, rng=jax.random.PRNGKey(6))
    assert not np.array_equal(np.asarray(a.sequences), np.asarray(c.sequences))


def test_eos_freezes_sequence(setup):
    """After EOS, rows emit pad and seq_len stops growing."""
    _, params, mel = setup
    # Force EOS at generated position 2 for every row.
    opts = GenerationOptions(max_new_tokens=10,
                             forced_decoder_ids=((1, 50), (2, EOS)))
    prompt = jnp.asarray([[3], [3]], jnp.int32)
    out = encode_and_generate(params, CFG, jnp.asarray(mel), prompt, opts)
    seq = np.asarray(out.sequences)
    lens = np.asarray(out.seq_len)
    assert (lens == 3).all()
    assert (seq[:, 2] == EOS).all()
    assert (seq[:, 3:] == 0).all()


def test_quantized_cross_kv_parity(setup):  # noqa: F811
    """int8 cross-KV storage: greedy tokens match the exact path on the tiny
    model; sum_logprobs within quantisation tolerance."""
    import numpy as np
    from distil_whisper_tpu.generation import (GenerationOptions,
                                               encode_and_generate)
    _, params, mel = setup
    opts = GenerationOptions(max_new_tokens=16)
    prompt = jnp.asarray([[3], [3]], jnp.int32)
    exact = encode_and_generate(params, CFG, jnp.asarray(mel), prompt, opts)
    quant = encode_and_generate(params, CFG.replace(quantize_cross_kv=True),
                                jnp.asarray(mel), prompt, opts)
    np.testing.assert_array_equal(np.asarray(exact.sequences),
                                  np.asarray(quant.sequences))
    np.testing.assert_allclose(np.asarray(exact.sum_logprobs),
                               np.asarray(quant.sum_logprobs), atol=0.05)
