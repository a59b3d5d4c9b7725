"""On-chip pseudo-labelling throughput benchmark at the production setting.

Builds a whisper-large-v3-sized random checkpoint (bf16 safetensors via our
own saver) + a synthetic tone corpus, then runs the REAL
run_pseudo_labelling driver end-to-end (streaming pack -> prefetched mel ->
bs-64 generate -> incremental Arrow write) and reports audio-hrs/hour.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_pl_throughput.py

Env: PL_BATCH (default 64), PL_TOKENS (default 256 = reference PL budget;
real checkpoints stop at EOS sooner, so this is the worst case), PL_HOURS
(default 2.0 hours of synthetic audio).
"""

import json
import os
import re
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params, save_pretrained
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from helpers import make_tiny_checkpoint  # tokenizer artifact layout

    batch = int(os.environ.get("PL_BATCH", "32"))
    tokens = int(os.environ.get("PL_TOKENS", "256"))
    hours = float(os.environ.get("PL_HOURS", "2.0"))
    quant = os.environ.get("PL_QUANT") == "1"
    quant_enc = os.environ.get("PL_QUANT_ENC") == "1"
    quant_self = os.environ.get("PL_QUANT_SELF") == "1"
    quant_dec = os.environ.get("PL_QUANT_DEC") == "1"
    quant_lm = os.environ.get("PL_QUANT_LM") == "1"
    workers = int(os.environ.get("PL_WORKERS", "0"))

    root = Path(os.environ.get("PL_ROOT", "/tmp/plbench_shared"))
    root.mkdir(parents=True, exist_ok=True)
    ck = root / "teacher"

    if not (ck / "model.safetensors").exists():
        # tokenizer files from the tiny builder, then overwrite the weights
        # with a large-v3-sized tree
        make_tiny_checkpoint(ck)
        cfg = PRESETS["large-v3"]
        t0 = time.perf_counter()
        params = jax.device_get(
            init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16))
        save_pretrained(params, cfg, str(ck))
        del params
        print(f"checkpoint built in {time.perf_counter()-t0:.0f}s", flush=True)

    # synthetic corpus: ~28 s utterances, 2 speakers (exercises packing)
    import datasets
    n = int(hours * 3600 / 28)
    rng = np.random.default_rng(0)

    data = root / "data"
    if (data / "state.json").exists():
        print("reusing corpus", flush=True)

    def gen():
        for i in range(n):
            t = np.arange(int(28.0 * 16000)) / 16000.0
            a = (0.2 * np.sin(2 * np.pi * (150 + (i % 40) * 10) * t)
                 + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
            yield {"audio": {"array": a, "sampling_rate": 16000},
                   "text": "synthetic tone utterance number %d" % i,
                   "speaker_id": f"spk{i % 2}"}

    if not (data / "state.json").exists():
        datasets.Dataset.from_generator(gen).save_to_disk(str(data))
    print(f"corpus: {n} utterances (~{n*28/3600:.2f} h)", flush=True)

    from distil_whisper_tpu.cli.run_pseudo_labelling import main as pl_main
    import logging
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logging.getLogger("distil_whisper_tpu").addHandler(Capture())
    t0 = time.perf_counter()
    import shutil
    shutil.rmtree(root / "pl_out", ignore_errors=True)
    pl_args = ["--model_checkpoint", str(ck), "--dataset_path", str(data),
               "--output_dir", str(root / "pl_out"),
               "--per_device_batch_size", str(batch),
               "--max_new_tokens", str(tokens), "--language", "en",
               "--speaker_id_column_name", "speaker_id",
               "--logging_steps", "2"]
    if quant:
        pl_args.append("--quantize_cross_kv")
    if quant_enc:
        pl_args.append("--quantize_encoder")
    if quant_self:
        pl_args.append("--quantize_self_kv")
    if quant_dec:
        pl_args.append("--quantize_decoder")
    if quant_lm:
        pl_args.append("--quantize_lm_head")
    if workers:
        pl_args += ["--featurizer_workers", str(workers)]
    pl_main(pl_args)
    wall = time.perf_counter() - t0

    done = [m for m in records if m.startswith("done:")]
    m = re.search(r"RTFx ([0-9.]+)", done[0]) if done else None
    gen_rtfx = float(m.group(1)) if m else float("nan")
    audio_h = n * 28 / 3600
    print(json.dumps({
        "pl_batch": batch, "pl_tokens": tokens, "int8_cross_kv": quant,
        "int8_encoder": quant_enc, "int8_self_kv": quant_self,
        "int8_decoder": quant_dec, "int8_lm_head": quant_lm,
        "featurizer_workers": workers,
        "audio_hours": round(audio_h, 2),
        "wall_seconds_incl_compile": round(wall, 1),
        "audio_hours_per_hour_generate": round(gen_rtfx, 1),
        "audio_hours_per_hour_wall": round(audio_h / (wall / 3600), 1),
    }))


if __name__ == "__main__":
    main()
