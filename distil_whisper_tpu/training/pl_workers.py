"""Featurizer subprocess workers for pseudo-labelling (GIL escape).

After round 2's teacher-decode speedups, pseudo-labelling is HOST-bound at
bs32: audio load + 30 s packing + int16 conversion compete with the consume
path (detokenise + Arrow write) for the one GIL, and the chip idles between
batches (docs/PERFORMANCE.md).  This module moves the produce side into N
``multiprocessing`` (spawn) worker processes, matching the role of the
reference's dataloader ``num_workers`` (run_pseudo_labelling.py:751-790):

* each worker re-opens the dataset by path and takes a CONTIGUOUS 1/N shard
  (after the per-host shard) — same-speaker packing runs and
  ``condition_on_prev`` chains stay intact within a worker's shard and break
  only at shard boundaries, exactly like the multi-host sharding already
  does;
* workers ship zero-padded int16 PCM batches (audio is 16-bit at source, so
  int16 round-trips bit-exactly and halves queue traffic); the main process
  keeps everything device-related (upload, mel, generate);
* per-worker FIFO order is preserved by ``mp.Queue`` (one feeder thread per
  producer), so the consumer keys its condition-on-prev state by worker id.

Workers never touch JAX devices — they import numpy/datasets only and die
with the parent (daemon).
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Any, Dict, Iterator, Optional


def _worker(q, wid: int, n_workers: int, spec: Dict[str, Any]) -> None:
    """Subprocess body: load -> shard -> pack -> int16 batches onto ``q``.

    Must stay import-light: no jax device use, no module-level state from
    the parent (spawn context re-imports fresh).
    """
    import numpy as np

    from ..audio.io import load_audio
    from ..cli.common import load_dataset_any
    from .data import pack_samples_iter

    try:
        ds = load_dataset_any(spec["dataset_path"], spec["split"])
        if hasattr(ds, "with_format"):
            ds = ds.with_format("numpy", columns=[spec["audio_col"]],
                                output_all_columns=True)
        if (spec["concatenate"] and spec["speaker_col"]
                and hasattr(ds, "sort")):
            ds = ds.sort(spec["speaker_col"])
        host_idx, host_n = spec["host_shard"]
        if host_n > 1 and hasattr(ds, "shard"):
            ds = ds.shard(num_shards=host_n, index=host_idx, contiguous=True)
        if n_workers > 1 and hasattr(ds, "shard"):
            ds = ds.shard(num_shards=n_workers, index=wid, contiguous=True)

        def rows():
            for row in ds:
                yield {
                    "audio": load_audio(row[spec["audio_col"]],
                                        spec["sampling_rate"]),
                    "text": row.get(spec["text_col"], ""),
                    "speaker_id": (row.get(spec["speaker_col"])
                                   if spec["speaker_col"] else None),
                }

        if spec["concatenate"]:
            samples = pack_samples_iter(rows(),
                                        max_input_samples=spec["n_samples"])
        else:
            def _plain():
                for s in rows():
                    s["condition_on_prev"] = 0
                    yield s
            samples = _plain()

        bsz, n_samp = spec["local_bsz"], spec["n_samples"]
        group: list = []

        def flush():
            wav16 = np.zeros((bsz, n_samp), np.int16)
            lens = []
            for j, g in enumerate(group):
                w = g["audio"][:n_samp]
                lens.append(len(w))
                wav16[j, :len(w)] = np.clip(np.round(w * 32768.0),
                                            -32768, 32767).astype(np.int16)
            q.put({"worker": wid, "n": len(group), "lens": lens,
                   "texts": [g["text"] for g in group],
                   "cond": [int(g.get("condition_on_prev") or 0)
                            for g in group],
                   "wav16": wav16})

        for s in samples:
            group.append(s)
            if len(group) == bsz:
                flush()
                group = []
        if group:
            flush()
        q.put({"worker": wid, "end": True})
    except BaseException as e:  # noqa: BLE001 — surfaced in the parent
        q.put({"worker": wid, "error": f"{type(e).__name__}: {e}"})


def worker_feature_batches(spec: Dict[str, Any], n_workers: int,
                           queue_depth: int = 2) -> Iterator[Dict[str, Any]]:
    """Run N featurizer subprocesses; yield their int16 batches as they
    arrive (per-worker order preserved).  Raises if any worker errors."""
    ctx = mp.get_context("spawn")
    q = ctx.Queue(maxsize=max(n_workers * queue_depth, 2))
    procs = [ctx.Process(target=_worker, args=(q, wid, n_workers, spec),
                         daemon=True)
             for wid in range(n_workers)]
    for p in procs:
        p.start()
    done = 0
    try:
        while done < n_workers:
            item = q.get()
            if "error" in item:
                raise RuntimeError(
                    f"featurizer worker {item['worker']} failed: "
                    f"{item['error']}")
            if item.get("end"):
                done += 1
                continue
            yield item
    finally:
        for p in procs:
            if p.is_alive():
                p.terminate()
            p.join()
