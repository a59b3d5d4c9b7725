"""Streaming input pipeline tests."""

import time

import numpy as np
import pytest

from distil_whisper_tpu.training.data_stream import (
    ShuffleBuffer, Prefetcher, streaming_batches,
)


def test_shuffle_buffer_is_permutation():
    items = list(range(100))
    out = list(ShuffleBuffer(items, buffer_size=16,
                             rng=np.random.default_rng(0)))
    assert sorted(out) == items
    assert out != items  # actually shuffled


def test_prefetcher_overlaps_and_preserves_order():
    def gen():
        for i in range(5):
            time.sleep(0.01)
            yield i
    assert list(Prefetcher(gen, depth=2)) == [0, 1, 2, 3, 4]


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")
    it = Prefetcher(gen, depth=2)
    out = []
    with pytest.raises(ValueError, match="boom"):
        for x in it:
            out.append(x)
    assert out == [1]


def test_streaming_batches_filters_and_repeats():
    rows = [{"x": i} for i in range(10)]

    def prepare(row):
        return None if row["x"] % 2 else {"v": row["x"]}

    def collate(samples):
        return [s["v"] for s in samples]

    it = streaming_batches(rows, prepare, collate, batch_size=3,
                           shuffle_buffer_size=4, repeat=True)
    batches = [next(it) for _ in range(4)]
    seen = [v for b in batches for v in b]
    assert all(v % 2 == 0 for v in seen)
    assert len(batches[0]) == 3  # repeat=True -> always full batches


def test_streaming_batches_final_partial_batch():
    rows = [{"x": i} for i in range(5)]
    it = streaming_batches(rows, lambda r: {"v": r["x"]},
                           lambda s: [x["v"] for x in s], batch_size=2)
    batches = list(it)
    assert [len(b) for b in batches] == [2, 2, 1]
