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


def test_pl_featurizer_subprocess_workers(tmp_path):
    """run_pseudo_labelling --featurizer_workers 2: the full driver with
    subprocess featurizers produces the same artifact set as the in-process
    path (dataset + CSV), with every row labelled exactly once."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from helpers import make_tiny_checkpoint, make_tone_dataset
    from distil_whisper_tpu.cli.run_pseudo_labelling import main as pl_main

    ck = tmp_path / "ck"
    make_tiny_checkpoint(ck)
    make_tone_dataset(tmp_path / "data", n=6)
    res = pl_main([
        "--model_checkpoint", str(ck), "--dataset_path",
        str(tmp_path / "data"), "--output_dir", str(tmp_path / "pl"),
        "--per_device_batch_size", "1", "--language", "en",
        "--max_new_tokens", "8", "--dtype", "float32",
        "--featurizer_workers", "2"])
    import datasets
    ds = datasets.load_from_disk(res)
    # tone dataset rows are packable; workers shard contiguously so the
    # total row count matches the single-worker packing of two half shards
    assert len(ds) >= 2
    assert all(r["whisper_transcript"] for r in ds)
    assert (tmp_path / "pl" / "transcriptions.csv").exists()
    csv_rows = open(tmp_path / "pl" / "transcriptions.csv").read().splitlines()
    assert len(csv_rows) - 1 == len(ds)
