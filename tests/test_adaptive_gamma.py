"""Adaptive draft length on the continuous speculative engine.

The reference's speculative gamma is a fixed flag; the optimal draft length
moves with the measured acceptance (long drafts amortise the verify when
the draft is usually right, short drafts stop wasting draft compute when it
is not).  The controller walks a compiled-gamma ladder {gamma/2, gamma,
2*gamma} toward the COST-OPTIMAL rung for the per-draft acceptance
estimated from the engine's drafted/accepted counters —
serving.optimal_gamma prices the draft steps (draft/teacher decode-cost
ratio, layer-count proxy) and the verify width, so high acceptance alone
does not justify a raise when drafting is expensive (the naive
raise-at-0.8 rule measured a 281 -> 211 audio-s/s serving regression,
BENCH_SERVING_r05.json).  Token identity is gamma-independent, so the
controller is a pure throughput knob — pinned here across live switches.
"""

import threading

import numpy as np
import jax.numpy as jnp
import pytest

from helpers import make_tiny_checkpoint


def _tone(seconds, freq, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * 16000)) / 16000.0
    return (0.2 * np.sin(2 * np.pi * freq * t)
            + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)


def test_estimate_accept_inverts():
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    est = ContinuousTranscriber._estimate_accept
    for g in (2, 4, 8):
        for a in (0.2, 0.5, 0.8, 0.95):
            ratio = a * (1 - a ** g) / ((1 - a) * g)
            assert abs(est(ratio, g) - a) < 0.02, (g, a)
    assert est(0.0, 4) < 0.01
    assert est(1.0, 4) > 0.99


def test_optimal_gamma_prices_draft_cost():
    from distil_whisper_tpu.serving import optimal_gamma
    levels = [2, 5, 10]
    # cheap draft (distil 2/32 layers): raise pays at high acceptance
    assert optimal_gamma(0.95, levels, draft_cost=2 / 32) == 10
    # ...but NOT at 0.8 — the regression the cost model exists to avoid
    # (BENCH_SERVING_r05.json: gamma 10 at a=0.8 lost 25% served audio-s/s)
    assert optimal_gamma(0.80, levels, draft_cost=2 / 32) == 5
    # low acceptance: stop wasting draft compute
    assert optimal_gamma(0.10, levels, draft_cost=2 / 32) == 2
    # expensive draft (same-size model): long drafts never pay
    assert optimal_gamma(0.95, levels, draft_cost=1.0) == 2
    # free drafts (ngram lookup): only the verify width bounds gamma,
    # so high acceptance pushes to the top rung
    assert optimal_gamma(0.95, levels, draft_cost=0.0) == 10
    # monotone in acceptance for fixed costs
    prev = 0
    for a in (0.05, 0.3, 0.6, 0.9, 0.99):
        g = optimal_gamma(a, levels, draft_cost=0.1)
        assert g >= prev, (a, g, prev)
        prev = g


def test_gamma_step_hysteresis_and_counters():
    from distil_whisper_tpu.serving import _gamma_step
    levels = [2, 4, 8]
    stats = {"gamma_raises": 0, "gamma_drops": 0}
    # one rung per window, toward the target
    idx = _gamma_step(0.97, levels, 0, draft_cost=0.05, stats=stats)
    assert idx == 1 and stats["gamma_raises"] == 1
    idx = _gamma_step(0.97, levels, idx, draft_cost=0.05, stats=stats)
    assert idx == 2 and stats["gamma_raises"] == 2
    # at the optimum: no move
    assert _gamma_step(0.97, levels, 2, draft_cost=0.05, stats=stats) == 2
    # collapse on low acceptance
    idx = _gamma_step(0.05, levels, 2, draft_cost=0.05, stats=stats)
    assert idx == 1 and stats["gamma_drops"] == 1
    # sub-margin predicted gains do not move the rung (hysteresis)
    stats2 = {"gamma_raises": 0, "gamma_drops": 0}
    for a in (0.0, 0.2, 0.4, 0.6, 0.8, 1.0):
        _gamma_step(a, levels, 1, draft_cost=0.05, stats=stats2,
                    margin=10.0)
    assert stats2 == {"gamma_raises": 0, "gamma_drops": 0}


@pytest.fixture(scope="module")
def spec_pair(tmp_path_factory):
    root = tmp_path_factory.mktemp("adaptive")
    teacher_ck = make_tiny_checkpoint(root / "teacher", decoder_layers=2,
                                      seed=0)
    draft_ck = make_tiny_checkpoint(root / "draft", decoder_layers=1, seed=7)
    from distil_whisper_tpu.models import load_params
    from distil_whisper_tpu.pipeline import WhisperPipeline
    d_params, d_cfg = load_params(draft_ck, dtype=jnp.float32)
    pipe = WhisperPipeline(teacher_ck, dtype=jnp.float32, batch_size=2,
                           max_new_tokens=48)
    return pipe, (d_params, d_cfg)


def _drive(tr, n, budget, seconds=1.0):
    results = [None] * n
    errors = []

    def post(i):
        try:
            results[i] = tr.submit(_tone(seconds, 200.0 + 30 * i, seed=i),
                                   language="en", max_new_tokens=budget,
                                   timeout=600)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=post, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    return results


def test_controller_raises_gamma_when_acceptance_high(spec_pair):
    pipe, assistant = spec_pair
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    # draft_cost pinned to the cheap-draft regime: the tiny fixture's
    # 1-layer draft over a 2-layer teacher defaults to 0.5, where the
    # cost model (correctly) refuses to raise even at 95% acceptance
    tr = ContinuousTranscriber(pipe, batch_size=2, max_new_tokens=48,
                               block_steps=10, assistant=assistant,
                               gamma=4, adaptive_gamma=True,
                               synthetic_acceptance=0.95,
                               draft_cost=0.05).start()
    try:
        assert tr._gamma_levels == [2, 4, 8]
        _drive(tr, 6, budget=48)
        assert tr.stats["gamma_raises"] >= 1, tr.stats
        assert tr.stats["gamma_current"] == 8, tr.stats
        snap = tr.snapshot()["speculative"]
        assert snap["adaptive"] is True
        assert snap["gamma_current"] == 8
    finally:
        tr.stop()


def test_controller_drops_gamma_when_acceptance_low(spec_pair):
    pipe, assistant = spec_pair
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    tr = ContinuousTranscriber(pipe, batch_size=2, max_new_tokens=48,
                               block_steps=10, assistant=assistant,
                               gamma=4, adaptive_gamma=True,
                               synthetic_acceptance=0.05).start()
    try:
        _drive(tr, 6, budget=48)
        assert tr.stats["gamma_drops"] >= 1, tr.stats
        assert tr.stats["gamma_current"] == 2, tr.stats
    finally:
        tr.stop()


def test_identity_preserved_across_gamma_switches(spec_pair):
    """Real (non-synthetic) teacher/draft with the controller on: random
    weights give near-zero real acceptance, so the controller drops gamma
    mid-traffic — every output must still equal the plain pipeline's greedy
    text (the speculative identity guarantee, per gamma and across the
    switch)."""
    pipe, assistant = spec_pair
    from distil_whisper_tpu.serving_engine import ContinuousTranscriber
    tr = ContinuousTranscriber(pipe, batch_size=2, max_new_tokens=8,
                               block_steps=6, assistant=assistant,
                               gamma=4, adaptive_gamma=True).start()
    try:
        results = _drive(tr, 6, budget=8)
        for i, r in enumerate(results):
            wav = _tone(1.0, 200.0 + 30 * i, seed=i)
            expect = pipe(wav, language="en", max_new_tokens=8)["text"]
            assert r["text"] == expect, f"request {i}"
        # random weights rarely agree: the controller moved down the ladder
        assert tr.stats["gamma_drops"] >= 1, tr.stats
    finally:
        tr.stop()


# ----------------------------------------------------------------------
# The same controller on the MICROBATCH scheduler (VERDICT r4 #8): whole
# batches feed the window instead of per-lane counter deltas; the next
# batch compiles/uses the new rung.
# ----------------------------------------------------------------------

def test_microbatch_controller_raises_gamma(spec_pair):
    pipe, assistant = spec_pair
    from distil_whisper_tpu.serving import BatchingTranscriber
    tr = BatchingTranscriber(pipe, batch_size=2, max_new_tokens=48,
                             assistant=assistant, gamma=4,
                             adaptive_gamma=True,
                             synthetic_acceptance=0.95,
                             draft_cost=0.05).start()
    try:
        assert tr._gamma_levels == [2, 4, 8]
        _drive(tr, 6, budget=48)
        assert tr.stats["gamma_raises"] >= 1, tr.stats
        assert tr.stats["gamma_current"] == 8, tr.stats
        snap = tr.snapshot()["speculative"]
        assert snap["adaptive"] is True
        assert snap["gamma_current"] == 8
    finally:
        tr.stop()


def test_microbatch_controller_drops_gamma(spec_pair):
    pipe, assistant = spec_pair
    from distil_whisper_tpu.serving import BatchingTranscriber
    tr = BatchingTranscriber(pipe, batch_size=2, max_new_tokens=48,
                             assistant=assistant, gamma=4,
                             adaptive_gamma=True,
                             synthetic_acceptance=0.05).start()
    try:
        _drive(tr, 6, budget=48)
        assert tr.stats["gamma_drops"] >= 1, tr.stats
        assert tr.stats["gamma_current"] == 2, tr.stats
    finally:
        tr.stop()


def test_microbatch_identity_across_gamma_switches(spec_pair):
    """Real weights, controller on: outputs equal the plain pipeline's
    greedy text at every rung and across a switch.  The rung move is
    forced between drives (real tiny-model acceptance sits mid-band, so
    waiting for the controller to move on its own would be weather) —
    what's pinned is that the OUTPUT is rung-independent."""
    pipe, assistant = spec_pair
    from distil_whisper_tpu.serving import BatchingTranscriber
    tr = BatchingTranscriber(pipe, batch_size=2, max_new_tokens=8,
                             assistant=assistant, gamma=4,
                             adaptive_gamma=True).start()
    try:
        results = _drive(tr, 4, budget=8)
        tr._gamma_idx = 0          # the controller's drop rung (gamma 2)
        results += _drive(tr, 4, budget=8)
        for i, r in enumerate(results):
            wav = _tone(1.0, 200.0 + 30 * (i % 4), seed=i % 4)
            expect = pipe(wav, language="en", max_new_tokens=8)["text"]
            assert r["text"] == expect, f"request {i}"
    finally:
        tr.stop()
