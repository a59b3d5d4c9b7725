"""Shared CLI helpers: dataset loading, logging, tokenizer-artifact copying."""

from __future__ import annotations

import json
import logging
import shutil
import sys
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional

import numpy as np

logger = logging.getLogger("distil_whisper_tpu")


def apply_platform_env() -> None:
    """Honour ``DWT_PLATFORM`` (e.g. ``cpu``) for CLI subprocesses.

    The sandbox's sitecustomize force-registers the remote TPU platform and
    ignores ``JAX_PLATFORMS``; scripts that spawn fresh CLI processes (the
    real-weights conformance pack, CI rehearsals) set ``DWT_PLATFORM=cpu``
    to pin them to the host backend instead.  Call before any device use."""
    import os
    plat = os.environ.get("DWT_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

TOKENIZER_FILES = ("vocab.json", "merges.txt", "tokenizer.json",
                   "added_tokens.json", "special_tokens_map.json",
                   "tokenizer_config.json", "normalizer.json",
                   "preprocessor_config.json", "generation_config.json")


def setup_logging(verbose: bool = True) -> None:
    logging.basicConfig(
        stream=sys.stdout,
        level=logging.INFO if verbose else logging.WARNING,
        format="%(asctime)s [%(levelname)s] %(name)s: %(message)s")


def copy_tokenizer_files(src: str, dst: str) -> None:
    """Carry tokenizer/processor artifacts alongside exported weights."""
    dst_p = Path(dst)
    dst_p.mkdir(parents=True, exist_ok=True)
    for name in TOKENIZER_FILES:
        s = Path(src) / name
        if s.exists():
            shutil.copy(s, dst_p / name)


def load_dataset_any(path: str, split: Optional[str] = None):
    """Load a dataset from local disk.

    Accepts: a ``datasets`` save_to_disk dir (Dataset or DatasetDict), or a
    JSONL manifest with {"audio": <wav path>|{"array": ...}, "text": ...}.
    """
    p = Path(path)
    if p.is_dir():
        import datasets
        ds = datasets.load_from_disk(str(p))
        if split is not None and hasattr(ds, "keys") and split in ds:
            ds = ds[split]
        return ds
    if p.suffix == ".arrow":
        import datasets
        return datasets.Dataset.from_file(str(p))  # memory-mapped
    if p.suffix in (".jsonl", ".json"):
        import datasets
        rows = []
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
        return datasets.Dataset.from_list(rows)
    raise FileNotFoundError(f"cannot interpret dataset path {path}")


def parse_dataset_spec(dataset_str: str, splits: Optional[str] = None,
                       probabilities: Optional[str] = None) -> List[Dict[str, Any]]:
    """Parse the reference's `+`-delimited multi-dataset mini-DSL
    (convert_dataset_str_to_list, reference run_distillation.py:540-607):

        "path/a+path/b"  with optional "train+train" splits and "0.7+0.3"
        sampling probabilities.
    """
    names = dataset_str.split("+")
    split_list = splits.split("+") if splits else [None] * len(names)
    if probabilities:
        probs = [float(p) for p in probabilities.split("+")]
    else:
        probs = [1.0 / len(names)] * len(names)
    if not (len(names) == len(split_list) == len(probs)):
        raise ValueError("dataset/split/probability lists must align: "
                         f"{len(names)} vs {len(split_list)} vs {len(probs)}")
    total = sum(probs)
    return [{"path": n, "split": s, "probability": p / total}
            for n, s, p in zip(names, split_list, probs)]


def load_multiple_datasets(dataset_str: str, splits: Optional[str] = None,
                           probabilities: Optional[str] = None,
                           seed: int = 0,
                           stopping_strategy: str = "all_exhausted"):
    """Load and interleave `+`-delimited datasets by sampling probability
    (the reference's streaming interleave, run_distillation.py:610-694)."""
    specs = parse_dataset_spec(dataset_str, splits, probabilities)
    if len(specs) == 1:
        return load_dataset_any(specs[0]["path"], specs[0]["split"])
    import datasets
    all_ds = [load_dataset_any(s["path"], s["split"]) for s in specs]
    return datasets.interleave_datasets(
        all_ds, probabilities=[s["probability"] for s in specs],
        seed=seed, stopping_strategy=stopping_strategy)


def batched(iterable: Iterable, n: int) -> Iterable[List]:
    buf: List[Any] = []
    for x in iterable:
        buf.append(x)
        if len(buf) == n:
            yield buf
            buf = []
    if buf:
        yield buf


def parse_args_with_json(parser, argv=None):
    """HfArgumentParser-style single-JSON-file parsing: when the only
    argument is a ``.json`` path, read the flag dict from it
    (reference run_distillation.py:784-791)."""
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) == 1 and argv[0].endswith(".json"):
        with open(argv[0]) as f:
            cfg = json.load(f)
        flat = []
        for k, v in cfg.items():
            if isinstance(v, bool):
                if v:
                    flat.append(f"--{k}")
            else:
                flat.extend([f"--{k}", str(v)])
        return parser.parse_args(flat)
    return parser.parse_args(argv)


def add_noise_at_snr(audio: "np.ndarray", snr_db: float,
                     rng=None) -> "np.ndarray":
    """Mix white noise at the given SNR (the reference's noise-evaluation
    setting, noise_evaluation_scripts/run_distilled.sh:3-6, +40 -> -10 dB)."""
    rng = rng or np.random.default_rng(0)
    power = float(np.mean(audio ** 2)) + 1e-12
    noise_power = power / (10.0 ** (snr_db / 10.0))
    noise = rng.standard_normal(audio.shape).astype(np.float32)
    noise *= np.sqrt(noise_power / (np.mean(noise ** 2) + 1e-12))
    return (audio + noise).astype(np.float32)


def write_jsonl(path: str, rows: Iterable[Dict[str, Any]]) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
