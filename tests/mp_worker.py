"""Subprocess worker for the 2-process CPU distributed tests.

Usage: python mp_worker.py <mode> <process_id> <num_processes> <port> [args...]
Modes:
  helpers  — exercise host_local_batch_to_global / gather_rows /
             process_local_slice over a real 2-process global mesh
  train    — run the REAL run_distillation driver for 2 steps over the
             2-process mesh (args: teacher_ckpt student_ckpt data_dir out_dir)

Must run with JAX_PLATFORMS unset (sitecustomize pins the remote platform;
the cpu switch happens here) and XLA_FLAGS=--xla_force_host_platform_device_count=4.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    mode, pid, n, port = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                          sys.argv[4])
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=n, process_id=pid)
    assert jax.process_count() == n, jax.process_count()

    if mode == "helpers":
        import numpy as np
        from distil_whisper_tpu.parallel import make_mesh
        from distil_whisper_tpu.parallel.multihost import (
            host_local_batch_to_global, gather_rows, process_local_slice,
            global_row_positions)
        mesh = make_mesh()
        n_dev = len(jax.devices())
        per = n_dev // n
        local = (np.arange(per, dtype=np.float32) + 100 * pid)[:, None]
        g = host_local_batch_to_global(local, mesh)
        assert g.shape == (n_dev, 1), g.shape
        full = gather_rows(g)
        expect = sorted(float(x) for i in range(n)
                        for x in np.arange(per) + 100 * i)
        assert sorted(full.ravel().tolist()) == expect, full.ravel()
        # ROW ORDER, not just membership: global_row_positions must recover
        # exactly this host's rows in feed order from the gathered global
        # array (the eval-pairing invariant, ADVICE r2 medium)
        rowpos = global_row_positions(mesh, per)
        back = full[rowpos].ravel()
        assert back.tolist() == local.ravel().tolist(), (back, local)
        sl = process_local_slice(n_dev)
        assert (sl.stop - sl.start) == per
        print(f"proc {pid}: helpers OK", flush=True)

    elif mode == "train":
        teacher, student, data, out = sys.argv[5:9]
        from distil_whisper_tpu.cli.run_distillation import main as train_main
        common = [
            "--teacher_checkpoint", teacher,
            "--student_checkpoint", student,
            "--train_dataset_path", data,
            "--no_pseudo_labels",
            "--per_device_train_batch_size", "1",
            "--learning_rate", "1e-4", "--warmup_steps", "1",
            "--precision", "full",
            "--eval_steps", "100", "--logging_steps", "1",
            "--language", "en",
        ]
        # default (exact-teacher) path: the configuration every production
        # run uses unless opted in — keep its collective placement covered
        train_main(["--output_dir", out, "--max_steps", "2",
                    "--save_steps", "2"] + common)
        print(f"proc {pid}: train OK", flush=True)
        # int8 teacher over the same 2-process global mesh: proves the
        # jit-wrapped quantization of a globally-sharded tree works
        # multi-controller
        train_main(["--output_dir", out + "-int8", "--max_steps", "1",
                    "--save_steps", "1", "--teacher_precision", "int8"]
                   + common)
        print(f"proc {pid}: train int8 OK", flush=True)

    elif mode == "pl":
        # independent local mesh per process + contiguous dataset shard +
        # final WER-count allgather (run_pseudo_labelling's multi-host model)
        ckpt, data, out = sys.argv[5:8]
        from distil_whisper_tpu.cli.run_pseudo_labelling import main as pl_main
        res = pl_main([
            "--model_checkpoint", ckpt, "--dataset_path", data,
            "--output_dir", out, "--per_device_batch_size", "1",
            "--language", "en", "--max_new_tokens", "8",
            "--dtype", "float32", "--compute_wer"])
        import datasets
        ds = datasets.load_from_disk(res)
        assert len(ds) >= 1, len(ds)
        print(f"proc {pid}: pl OK ({len(ds)} rows)", flush=True)

    elif mode == "eval":
        ckpt, data, out = sys.argv[5:8]
        from distil_whisper_tpu.cli.run_eval import main as eval_main
        res = eval_main([
            "--model_checkpoint", ckpt, "--dataset_path", data,
            "--mode", "short", "--language", "en", "--batch_size", "2",
            "--max_new_tokens", "8", "--dtype", "float32",
            # one shared path: the driver suffixes it per process
            "--output_json", f"{out}/eval.json"])
        assert "wer" in res, res
        print(f"proc {pid}: eval OK wer={res['wer']}", flush=True)

    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
