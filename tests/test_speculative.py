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
