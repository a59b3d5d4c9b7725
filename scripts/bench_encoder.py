"""On-chip encoder benchmark: XLA fused attention vs Pallas flash variants.

Times encode() for large-v3 (32 layers, d=1280) at bs16 bf16 under:
  * einsum (current default), fast_bf16_attention on
  * flash pad-once, block 512 / 256 / 1024 (flash ignores fast_bf16 — it is
    fp32-softmax internally)

Run: PYTHONPATH=/root/repo python scripts/profile/bench_encoder.py
"""

import json
import time

import numpy as np


def fetch(x):
    np.asarray(x)


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.models.whisper import encode

    batch = 16
    base = PRESETS["large-v3"]
    params = init_params(base, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((batch, base.num_mel_bins, 3000)),
                      jnp.bfloat16)

    results = {}
    variants = [
        ("einsum_bf16", base.replace(fast_bf16_attention=True), {}),
        ("einsum_f32", base, {}),
        ("flash_512", base.replace(use_flash_encoder=True), {}),
    ]
    for name, cfg, _ in variants:
        @jax.jit
        def enc_fn(params, mel, cfg=cfg):
            return encode(params["encoder"], cfg, mel,
                          dtype=jnp.bfloat16)[:, :2, :2]

        try:
            out = enc_fn(params, mel); fetch(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = enc_fn(params, mel); fetch(out)
            dt = (time.perf_counter() - t0) / 5
            results[name] = round(dt * 1e3, 2)
            print(f"{name}: {dt*1e3:.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            results[name] = None

    # block-size sweep via direct kernel timing
    from distil_whisper_tpu.ops.attention import flash_padded
    q = jnp.asarray(rng.standard_normal((batch, 1536, 20, 64)), jnp.bfloat16)
    seg = (jax.lax.broadcasted_iota(jnp.int32, (batch, 1536), 1)
           < 1500).astype(jnp.int32)
    for bq, bk in ((512, 512), (256, 512), (512, 256), (1536, 512),
                   (256, 256), (128, 128), (1536, 1536)):
        fn = jax.jit(lambda q, seg, bq=bq, bk=bk: flash_padded(
            q, q, q, seg, block_q=bq, block_k=bk)[:, :2, 0, :2])
        try:
            out = fn(q, seg); fetch(out)
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(q, seg); fetch(out)
            dt = (time.perf_counter() - t0) / 10
            results[f"kernel_q{bq}_k{bk}"] = round(dt * 1e3, 2)
            print(f"kernel q{bq} k{bk}: {dt*1e3:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"kernel q{bq} k{bk}: FAILED {e}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
