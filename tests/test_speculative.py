"""Speculative decoding: outputs must be IDENTICAL to teacher-only greedy
(the reference's own assertion, flax/run_speculative_decoding.py:114-116)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from distil_whisper_tpu.config import WhisperConfig
from distil_whisper_tpu.models import init_params
from distil_whisper_tpu.models.whisper import encode, cross_kv
from distil_whisper_tpu.generation import GenerationOptions, generate
from distil_whisper_tpu.generation.speculative import speculative_generate
from distil_whisper_tpu.training import init_student_from_teacher

TEACHER_CFG = WhisperConfig(
    vocab_size=512, num_mel_bins=80, d_model=64,
    encoder_layers=2, decoder_layers=4,
    encoder_attention_heads=4, decoder_attention_heads=4,
    encoder_ffn_dim=96, decoder_ffn_dim=96,
    pad_token_id=0, eos_token_id=2, decoder_start_token_id=3,
    begin_suppress_tokens=())


@pytest.fixture(scope="module")
def setup():
    teacher = init_params(TEACHER_CFG, jax.random.PRNGKey(0))
    draft, d_cfg = init_student_from_teacher(teacher, TEACHER_CFG,
                                             decoder_layers=2)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((1, 80, 3000)), jnp.float32)
    enc = encode(teacher["encoder"], TEACHER_CFG, mel)
    t_cross = cross_kv(teacher["decoder"], TEACHER_CFG, enc)
    d_cross = cross_kv(draft["decoder"], d_cfg, enc)
    return teacher, draft, d_cfg, t_cross, d_cross


@pytest.mark.parametrize("gamma", [1, 3, 5])
def test_identical_to_teacher_greedy(setup, gamma):
    teacher, draft, d_cfg, t_cross, d_cross = setup
    opts = GenerationOptions(max_new_tokens=32, suppress_tokens=(7, 8))
    prompt = jnp.asarray([[3]], jnp.int32)

    golden = generate(teacher["decoder"], TEACHER_CFG, t_cross, prompt, opts)
    g_seq = np.asarray(golden.sequences)[0][:int(golden.seq_len[0])]

    out = speculative_generate(
        teacher["decoder"], TEACHER_CFG, draft["decoder"], d_cfg,
        t_cross, d_cross, prompt, opts, gamma=gamma)
    s_seq = np.asarray(out.sequences)[0][:int(out.seq_len[0])]
    np.testing.assert_array_equal(s_seq, g_seq)


@pytest.mark.parametrize("seed", [17, 41])
def test_identical_to_teacher_greedy_multi_seed(seed):
    """Same identity guarantee across fresh random teacher/draft/mel seeds —
    the accept/reject path taken depends entirely on the weights."""
    teacher = init_params(TEACHER_CFG, jax.random.PRNGKey(seed))
    draft, d_cfg = init_student_from_teacher(teacher, TEACHER_CFG,
                                             decoder_layers=2)
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(rng.standard_normal((1, 80, 3000)), jnp.float32)
    enc = encode(teacher["encoder"], TEACHER_CFG, mel)
    t_cross = cross_kv(teacher["decoder"], TEACHER_CFG, enc)
    d_cross = cross_kv(draft["decoder"], d_cfg, enc)
    opts = GenerationOptions(max_new_tokens=24)
    prompt = jnp.asarray([[3]], jnp.int32)

    golden = generate(teacher["decoder"], TEACHER_CFG, t_cross, prompt, opts)
    out = speculative_generate(
        teacher["decoder"], TEACHER_CFG, draft["decoder"], d_cfg,
        t_cross, d_cross, prompt, opts, gamma=4)
    np.testing.assert_array_equal(
        np.asarray(out.sequences)[0][:int(out.seq_len[0])],
        np.asarray(golden.sequences)[0][:int(golden.seq_len[0])])


def test_draft_equals_teacher_accepts_everything(setup):
    """Draft == teacher -> every proposal accepted, minimal rounds."""
    teacher, _, _, t_cross, _ = setup
    opts = GenerationOptions(max_new_tokens=20)
    prompt = jnp.asarray([[3]], jnp.int32)
    out = speculative_generate(
        teacher["decoder"], TEACHER_CFG, teacher["decoder"], TEACHER_CFG,
        t_cross, t_cross, prompt, opts, gamma=4)
    assert int(out.accepted) == int(out.drafted) or bool(
        int(out.seq_len[0]) < 21 + 1)  # early EOS also fine
    golden = generate(teacher["decoder"], TEACHER_CFG, t_cross, prompt, opts)
    np.testing.assert_array_equal(
        np.asarray(out.sequences)[0][:int(out.seq_len[0])],
        np.asarray(golden.sequences)[0][:int(golden.seq_len[0])])


def test_batched_matches_per_sample_bs1():
    """speculative_generate_batched: every lane's output must equal the
    bs-1 loop run on that sample alone (lanes diverge in cursors: distinct
    mels give distinct acceptance patterns and lengths) AND equal
    teacher-only greedy."""
    from distil_whisper_tpu.generation.speculative import (
        speculative_generate_batched)

    teacher = init_params(TEACHER_CFG, jax.random.PRNGKey(0))
    draft, d_cfg = init_student_from_teacher(teacher, TEACHER_CFG,
                                             decoder_layers=2)
    rng = np.random.default_rng(7)
    n = 3
    mel = jnp.asarray(rng.standard_normal((n, 80, 3000)), jnp.float32)
    enc = encode(teacher["encoder"], TEACHER_CFG, mel)
    t_cross = cross_kv(teacher["decoder"], TEACHER_CFG, enc)
    d_cross = cross_kv(draft["decoder"], d_cfg, enc)
    opts = GenerationOptions(max_new_tokens=24)
    prompts = jnp.full((n, 1), 3, jnp.int32)

    out = jax.jit(lambda tc, dc, p: speculative_generate_batched(
        teacher["decoder"], TEACHER_CFG, draft["decoder"], d_cfg,
        tc, dc, p, opts, gamma=3))(t_cross, d_cross, prompts)
    assert out.sequences.shape == (n, 1 + 24)
    lens = np.asarray(out.seq_len)

    def lane(tree, i):
        return jax.tree.map(lambda x: x[:, i:i + 1], tree)

    for i in range(n):
        single = speculative_generate(
            teacher["decoder"], TEACHER_CFG, draft["decoder"], d_cfg,
            lane(t_cross, i), lane(d_cross, i), prompts[i:i + 1], opts,
            gamma=3)
        np.testing.assert_array_equal(
            np.asarray(out.sequences)[i][:int(lens[i])],
            np.asarray(single.sequences)[0][:int(single.seq_len[0])])
        golden = generate(teacher["decoder"], TEACHER_CFG, lane(t_cross, i),
                          prompts[i:i + 1], opts)
        np.testing.assert_array_equal(
            np.asarray(out.sequences)[i][:int(lens[i])],
            np.asarray(golden.sequences)[0][:int(golden.seq_len[0])])


def test_speculative_jits(setup):
    teacher, draft, d_cfg, t_cross, d_cross = setup
    opts = GenerationOptions(max_new_tokens=16)

    @jax.jit
    def fn(t_dec, d_dec, t_cross, d_cross, prompt):
        return speculative_generate(t_dec, TEACHER_CFG, d_dec, d_cfg,
                                    t_cross, d_cross, prompt, opts, gamma=3)
    prompt = jnp.asarray([[3]], jnp.int32)
    out = fn(teacher["decoder"], draft["decoder"], t_cross, d_cross, prompt)
    assert int(out.seq_len[0]) > 1


def test_synthetic_acceptance_follows_prefix_law(setup):
    """synthetic_acceptance=k drives the real accept/verify loop at a
    controlled PER-TOKEN accept probability k.  Speculative acceptance is
    prefix-structured (a round accepts the longest matching prefix), so the
    accepted/drafted ratio must follow the geometric law
    E[n]/gamma = sum_{i=1..gamma} k^i / gamma — and rounds must shrink
    monotonically as k grows."""
    teacher, draft, d_cfg, t_cross, d_cross = setup
    opts = GenerationOptions(max_new_tokens=96)
    prompt = jnp.asarray([[TEACHER_CFG.decoder_start_token_id]], jnp.int32)
    gamma = 5
    stats = {}
    for k in (0.6, 0.8, 0.95):
        out = speculative_generate(teacher["decoder"], TEACHER_CFG,
                                   draft["decoder"], d_cfg, t_cross, d_cross,
                                   prompt, opts, gamma=gamma,
                                   synthetic_acceptance=k)
        # the whole budget was emitted (oracle never hits EOS)
        assert int(out.seq_len[0]) == 1 + 96
        stats[k] = (float(out.drafted), float(out.accepted),
                    float(out.rounds))
        # exact host simulation of the same position-keyed bernoulli
        # stream: the on-model loop must reproduce it round for round
        key = jax.random.PRNGKey(0)

        def agree(pos):
            return bool(jax.random.bernoulli(jax.random.fold_in(key, pos),
                                             k))
        p, total = 1, 97
        cur, drafted, accepted, rounds = p + 1, 0, 0, 0
        while cur < total:
            n = 0
            for i in range(gamma):
                if agree(cur + i):
                    n += 1
                else:
                    break
            drafted += gamma
            accepted += n
            rounds += 1
            if cur + n + 1 >= total:
                break
            cur = cur + n + 1
        assert stats[k] == (drafted, accepted, rounds), (k, stats[k],
                                                         (drafted, accepted,
                                                          rounds))
        # and the asymptotic prefix law holds loosely
        expected = sum(k ** i for i in range(1, gamma + 1)) / gamma
        assert abs(accepted / drafted - expected) < 0.15
    # higher acceptance -> fewer rounds / fewer drafted tokens for the
    # same budget
    assert stats[0.6][2] > stats[0.8][2] > stats[0.95][2], stats


# ----------------------------------------------------------------------
# Prompt-lookup (n-gram) speculation — draft-free; same identity bar.
# ----------------------------------------------------------------------

def test_ngram_propose_unit():
    """Handcrafted lookup: longest match wins, continuation is copied,
    self-match and not-yet-accepted junk are excluded."""
    from distil_whisper_tpu.generation.speculative import _propose_ngram
    # accepted prefix: 5 6 7 9 5 6 7   (cur=7); the last 3-gram [5,6,7]
    # recurs at j=0 -> continuation t[3:6] = [9, 5, 6]
    toks = jnp.asarray([[5, 6, 7, 9, 5, 6, 7, 1, 1, 1, 1, 1]], jnp.int32)
    d, found = _propose_ngram(toks, jnp.asarray(7, jnp.int32),
                              gamma=3, max_ngram=3, pad_id=0)
    assert bool(found)
    np.testing.assert_array_equal(np.asarray(d), [9, 5, 6])
    # no repeat anywhere -> not found, pad proposals
    toks2 = jnp.asarray([[3, 4, 5, 6, 7, 8, 0, 0, 0, 0, 0, 0]], jnp.int32)
    d2, found2 = _propose_ngram(toks2, jnp.asarray(6, jnp.int32),
                                gamma=3, max_ngram=3, pad_id=0)
    assert not bool(found2)
    np.testing.assert_array_equal(np.asarray(d2), [0, 0, 0])
    # junk BEYOND cur must not be used as a match source: same 3-gram
    # present only at positions >= cur
    toks3 = jnp.asarray([[3, 4, 5, 6, 7, 8, 6, 7, 8, 9, 9, 9]], jnp.int32)
    _, found3 = _propose_ngram(toks3, jnp.asarray(6, jnp.int32),
                               gamma=3, max_ngram=3, pad_id=0)
    # last 3-gram of the ACCEPTED prefix (cur=6) is [6,7,8] at j=3; the
    # copy at j=6 sits at cur and may not match (j + k <= cur - 1)
    assert not bool(found3)


@pytest.mark.parametrize("gamma,max_ngram", [(3, 2), (5, 3)])
def test_ngram_identical_to_teacher_greedy(setup, gamma, max_ngram):
    from distil_whisper_tpu.generation.speculative import (
        ngram_speculative_generate)
    teacher, _, _, t_cross, _ = setup
    opts = GenerationOptions(max_new_tokens=32, suppress_tokens=(7, 8))
    prompt = jnp.asarray([[3]], jnp.int32)
    golden = generate(teacher["decoder"], TEACHER_CFG, t_cross, prompt, opts)
    g_seq = np.asarray(golden.sequences)[0][:int(golden.seq_len[0])]
    out = ngram_speculative_generate(
        teacher["decoder"], TEACHER_CFG, t_cross, prompt, opts,
        gamma=gamma, max_ngram=max_ngram)
    s_seq = np.asarray(out.sequences)[0][:int(out.seq_len[0])]
    np.testing.assert_array_equal(s_seq, g_seq)


def test_ngram_batched_matches_bs1():
    from distil_whisper_tpu.generation.speculative import (
        ngram_speculative_generate, ngram_speculative_generate_batched)
    teacher = init_params(TEACHER_CFG, jax.random.PRNGKey(11))
    rng = np.random.default_rng(11)
    mel = jnp.asarray(rng.standard_normal((3, 80, 3000)), jnp.float32)
    enc = encode(teacher["encoder"], TEACHER_CFG, mel)
    t_cross = cross_kv(teacher["decoder"], TEACHER_CFG, enc)
    opts = GenerationOptions(max_new_tokens=24)
    prompts = jnp.tile(jnp.asarray([[3]], jnp.int32), (3, 1))
    outb = ngram_speculative_generate_batched(
        teacher["decoder"], TEACHER_CFG, t_cross, prompts, opts, gamma=3)
    for i in range(3):
        tci = jax.tree.map(lambda x: x[:, i:i + 1], t_cross)
        o1 = ngram_speculative_generate(
            teacher["decoder"], TEACHER_CFG, tci, prompts[i:i + 1],
            opts, gamma=3)
        np.testing.assert_array_equal(np.asarray(outb.sequences)[i],
                                      np.asarray(o1.sequences)[0])
        assert int(outb.seq_len[i]) == int(o1.seq_len[0])


def _assert_same_output(out, golden, check_logprobs=True):
    np.testing.assert_array_equal(
        np.asarray(out.sequences)[0][:int(out.seq_len[0])],
        np.asarray(golden.sequences)[0][:int(golden.seq_len[0])])
    if check_logprobs:
        np.testing.assert_allclose(np.asarray(out.sum_logprobs),
                                   np.asarray(golden.sum_logprobs),
                                   atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out.no_speech_prob),
                                   np.asarray(golden.no_speech_prob),
                                   atol=1e-5)


# ----------------------------------------------------------------------
# Timestamp-FSM composition: speculative/ngram decode must be
# token-identical to timestamped greedy ``generate`` (the reference gets
# this composition from HF assisted generation, which re-runs the full
# logits-processor stack per verified position — training/run_eval.py:
# 706-735).  Vocab layout mimics the real Whisper tail so the FSM uses
# real index arithmetic (timestamp_begin = vocab_size - 1501 = 401).
# ----------------------------------------------------------------------

TS_VOCAB = 1902
TS_EOS = 300
TS_CFG = WhisperConfig(
    vocab_size=TS_VOCAB, num_mel_bins=80, d_model=64,
    encoder_layers=2, decoder_layers=4,
    encoder_attention_heads=4, decoder_attention_heads=4,
    encoder_ffn_dim=96, decoder_ffn_dim=96,
    pad_token_id=0, eos_token_id=TS_EOS, decoder_start_token_id=3,
    begin_suppress_tokens=())


@pytest.fixture(scope="module")
def ts_setup():
    teacher = init_params(TS_CFG, jax.random.PRNGKey(2))
    draft, d_cfg = init_student_from_teacher(teacher, TS_CFG,
                                             decoder_layers=2)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal((1, 80, 3000)), jnp.float32)
    enc = encode(teacher["encoder"], TS_CFG, mel)
    t_cross = cross_kv(teacher["decoder"], TS_CFG, enc)
    d_cross = cross_kv(draft["decoder"], d_cfg, enc)
    return teacher, draft, d_cfg, t_cross, d_cross


@pytest.mark.parametrize("gamma", [2, 4])
def test_timestamped_identical_to_greedy(ts_setup, gamma):
    teacher, draft, d_cfg, t_cross, d_cross = ts_setup
    opts = GenerationOptions(max_new_tokens=32, return_timestamps=True,
                             max_initial_timestamp_index=50,
                             no_speech_token_id=398)
    prompt = jnp.asarray([[3]], jnp.int32)
    golden = generate(teacher["decoder"], TS_CFG, t_cross, prompt, opts)
    out = speculative_generate(
        teacher["decoder"], TS_CFG, draft["decoder"], d_cfg,
        t_cross, d_cross, prompt, opts, gamma=gamma)
    _assert_same_output(out, golden)
    # FSM invariants hold on the emitted stream
    seq = np.asarray(out.sequences)[0][1:int(out.seq_len[0])]
    ts_begin = TS_CFG.timestamp_begin
    assert ts_begin <= seq[0] <= ts_begin + 50
    ts = [t for t in seq if t >= ts_begin]
    assert ts == sorted(ts)


@pytest.mark.parametrize("seed", [23, 57])
def test_timestamped_identity_multi_seed(seed):
    """Fresh weights/mel per seed: the FSM state the verify columns see must
    track every accept/reject pattern the weights produce."""
    teacher = init_params(TS_CFG, jax.random.PRNGKey(seed))
    draft, d_cfg = init_student_from_teacher(teacher, TS_CFG,
                                             decoder_layers=2)
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(rng.standard_normal((1, 80, 3000)), jnp.float32)
    enc = encode(teacher["encoder"], TS_CFG, mel)
    t_cross = cross_kv(teacher["decoder"], TS_CFG, enc)
    d_cross = cross_kv(draft["decoder"], d_cfg, enc)
    opts = GenerationOptions(max_new_tokens=28, return_timestamps=True,
                             max_initial_timestamp_index=50)
    prompt = jnp.asarray([[3]], jnp.int32)
    golden = generate(teacher["decoder"], TS_CFG, t_cross, prompt, opts)
    out = speculative_generate(
        teacher["decoder"], TS_CFG, draft["decoder"], d_cfg,
        t_cross, d_cross, prompt, opts, gamma=3)
    _assert_same_output(out, golden, check_logprobs=False)


@pytest.mark.parametrize("gamma,max_ngram", [(3, 2), (5, 3)])
def test_ngram_timestamped_identical_to_greedy(ts_setup, gamma, max_ngram):
    from distil_whisper_tpu.generation.speculative import (
        ngram_speculative_generate)
    teacher, _, _, t_cross, _ = ts_setup
    opts = GenerationOptions(max_new_tokens=32, return_timestamps=True,
                             max_initial_timestamp_index=50,
                             no_speech_token_id=398)
    prompt = jnp.asarray([[3]], jnp.int32)
    golden = generate(teacher["decoder"], TS_CFG, t_cross, prompt, opts)
    out = ngram_speculative_generate(
        teacher["decoder"], TS_CFG, t_cross, prompt, opts,
        gamma=gamma, max_ngram=max_ngram)
    _assert_same_output(out, golden)


def test_sum_logprobs_match_generate(setup):
    """Non-timestamp path: the new sum_logprobs / no_speech_prob outputs
    must reproduce ``generate``'s accounting (they make speculative a
    drop-in for the sequential ladder's greedy rung)."""
    teacher, draft, d_cfg, t_cross, d_cross = setup
    opts = GenerationOptions(max_new_tokens=24, no_speech_token_id=101)
    prompt = jnp.asarray([[3]], jnp.int32)
    golden = generate(teacher["decoder"], TEACHER_CFG, t_cross, prompt, opts)
    out = speculative_generate(
        teacher["decoder"], TEACHER_CFG, draft["decoder"], d_cfg,
        t_cross, d_cross, prompt, opts, gamma=3)
    _assert_same_output(out, golden)
    from distil_whisper_tpu.generation.speculative import (
        ngram_speculative_generate)
    outn = ngram_speculative_generate(
        teacher["decoder"], TEACHER_CFG, t_cross, prompt, opts, gamma=3)
    _assert_same_output(outn, golden)


@pytest.mark.parametrize("method", ["draft", "ngram"])
def test_padded_prompt_drop_in(ts_setup, method):
    """Left-padded condition-on-prev prompts (``pad_len`` + static
    ``sot_slot``) — the sequential long-form layout — must decode
    identically to ``generate`` under speculation, timestamps on."""
    teacher, draft, d_cfg, t_cross, d_cross = ts_setup
    opts = GenerationOptions(max_new_tokens=24, return_timestamps=True,
                             max_initial_timestamp_index=50,
                             no_speech_token_id=398)
    # [pad, pad, prev, prev, prev, sot] — pad_len=2, base prompt [sot]
    prompt = jnp.asarray([[0, 0, 17, 55, 21, 3]], jnp.int32)
    pad_len = jnp.asarray([2], jnp.int32)
    sot_slot = 5
    golden = generate(teacher["decoder"], TS_CFG, t_cross, prompt, opts,
                      pad_len=pad_len, sot_slot=sot_slot)
    if method == "draft":
        out = speculative_generate(
            teacher["decoder"], TS_CFG, draft["decoder"], d_cfg,
            t_cross, d_cross, prompt, opts, gamma=3,
            pad_len=pad_len, sot_slot=sot_slot)
    else:
        from distil_whisper_tpu.generation.speculative import (
            ngram_speculative_generate)
        out = ngram_speculative_generate(
            teacher["decoder"], TS_CFG, t_cross, prompt, opts, gamma=3,
            pad_len=pad_len, sot_slot=sot_slot)
    _assert_same_output(out, golden)


def test_ngram_periodic_oracle_accepts_all_lookups(setup):
    """With a period-R synthetic teacher the decoded text repeats with
    period R, so every successful lookup's proposals are correct: accepted
    == drafted, and tokens/round beats 1 (the plain-decode rate)."""
    from distil_whisper_tpu.generation.speculative import (
        ngram_speculative_generate)
    teacher, _, _, t_cross, _ = setup
    opts = GenerationOptions(max_new_tokens=64)
    prompt = jnp.asarray([[3]], jnp.int32)
    out = ngram_speculative_generate(
        teacher["decoder"], TEACHER_CFG, t_cross, prompt, opts,
        gamma=4, max_ngram=3, synthetic_period=8)
    drafted, accepted = int(out.drafted), int(out.accepted)
    assert drafted > 0 and accepted == drafted
    tokens_emitted = int(out.seq_len[0]) - 1
    assert tokens_emitted / int(out.rounds) > 2.0


def test_ngram_repeat_prob_calibrates_acceptance(setup):
    """synthetic_repeat_prob=q dilutes the period oracle into q-repeating
    text: lookup acceptance must rise monotonically with q, hit ~100% of
    drafted at q=1 (the pure-period ceiling) and ~0 at q=0 (unique filler
    everywhere — lookups never land)."""
    from distil_whisper_tpu.generation.speculative import (
        ngram_speculative_generate)
    teacher, _, _, t_cross, _ = setup
    opts = GenerationOptions(max_new_tokens=72)
    prompt = jnp.asarray([[3]], jnp.int32)
    rates = {}
    for q in (0.0, 0.5, 1.0):
        out = ngram_speculative_generate(
            teacher["decoder"], TEACHER_CFG, t_cross, prompt, opts,
            gamma=4, max_ngram=3, synthetic_period=8,
            synthetic_repeat_prob=q)
        drafted, accepted = int(out.drafted), int(out.accepted)
        rates[q] = accepted / drafted if drafted else 0.0
        # full budget always emitted (the oracle never chooses EOS)
        assert int(out.seq_len[0]) == 1 + 72, q
    assert rates[1.0] == 1.0, rates
    assert rates[0.0] <= 0.2, rates
    assert rates[0.0] <= rates[0.5] <= rates[1.0], rates
