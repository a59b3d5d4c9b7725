"""Cost of the engine's SAMPLING step-block variant vs the greedy block.

The continuous engine compiles two step-block programs (serving_engine.py):
the greedy block (argmax select — byte-identical to the engine before
sampling existed) and a sampling variant (per-lane temperature/top-k
categorical, dispatched by the host only while a sampled lane is
resident).  The sampling variant pays its select machinery (one
lax.top_k(k_max) + vmapped fold_in/categorical over the vocab) on EVERY
lane regardless of how many are actually sampling (a where() picks
greedy where temp == 0) — this script measures that overhead per decoded
token at serving scale so the docs can state it.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_sampled_block.py
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.pipeline import WhisperPipeline
    from distil_whisper_tpu.serving_engine import ContinuousBatchingEngine
    from distil_whisper_tpu.tokenizer import WhisperTokenizer

    preset = os.environ.get("BENCH_PRESET", "distil-large-v3")
    lanes = int(os.environ.get("BENCH_BATCH", "16"))
    block_steps = int(os.environ.get("BENCH_BLOCK", "16"))
    n_blocks = int(os.environ.get("BENCH_BLOCKS", "12"))

    cfg = PRESETS[preset].replace(fast_bf16_attention=True,
                                  use_flash_encoder=True)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    import tests.helpers as H
    ck = "/tmp/bench_server_tok"
    if not os.path.isdir(ck):
        H.make_tiny_checkpoint(ck)
    tok = WhisperTokenizer.from_pretrained(ck)
    pipe = WhisperPipeline(ck, dtype=jnp.bfloat16, batch_size=lanes,
                           max_new_tokens=256, params=params, cfg=cfg,
                           tokenizer=tok)

    eng = ContinuousBatchingEngine(pipe, lanes=lanes,
                                   block_steps=block_steps,
                                   max_new_tokens=256)
    eng.init_state()

    # probe mels built ON DEVICE (multi-GB host->device uploads wedge the
    # tunnel; dev-notes rule)
    mels = jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (lanes, cfg.num_mel_bins, 3000), jnp.bfloat16))(
        jax.random.PRNGKey(1))
    prompt = tok.prompt_ids(language="en", task="transcribe",
                            no_timestamps=True)
    half = lanes // 2

    def admit(sampled_lanes):
        temps = [0.9 if i < sampled_lanes else 0.0 for i in range(lanes)]
        eng.admit(mels, [prompt] * lanes, [256] * lanes, [False] * lanes,
                  list(range(lanes)), temps=temps,
                  top_ks=[50 if t > 0 else 0 for t in temps],
                  seeds=list(range(lanes)))

    def time_blocks(sampling, label):
        # warm: compile + one block
        p = eng.step(sampling=sampling)
        np.asarray(p)
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            p = eng.step(sampling=sampling)
        np.asarray(p)  # the only reliable sync on the axon tunnel
        dt = time.perf_counter() - t0
        ms_tok = dt * 1e3 / (n_blocks * block_steps)
        print(f"{label:28s} {ms_tok:7.3f} ms/token "
              f"({dt * 1e3 / n_blocks:.1f} ms/block)")
        return ms_tok

    admit(0)
    g = time_blocks(False, "greedy block (all greedy)")
    s0 = time_blocks(True, "sampling block (all greedy)")
    admit(half)
    s1 = time_blocks(True, f"sampling block ({half} sampled)")
    admit(0)
    g2 = time_blocks(False, "greedy block (again)")

    print(f"\nsampling-variant overhead: {100 * (s0 / g - 1):+.1f}% "
          f"(all-greedy lanes), {100 * (s1 / g - 1):+.1f}% "
          f"({half} sampled); greedy drift check {100 * (g2 / g - 1):+.1f}%")


if __name__ == "__main__":
    main()
