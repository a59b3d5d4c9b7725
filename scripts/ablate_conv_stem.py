"""Conv-stem ablation on-chip (large-v3 encoder stem, bs16 bf16).

The stem (conv k3 s1 80->1280, gelu, conv k3 s2 1280->1280, gelu) measures
~39 ms at bs16 — ~20x off the ~2 ms matmul roofline (236 GFLOP for conv2).
Variants:

  conv_xla        current lax.conv_general_dilated path
  conv_taps       conv as 3 shifted matmuls (tap-sum), stride by slicing
  conv_im2col     conv as one [B*T, 3*C_in] @ [3*C_in, C_out] matmul
  *_tanh          same with tanh-approx gelu (erf is VPU-heavy at 61M elems)
  stem_only_convs convs without gelu (isolates the activation cost)
"""

import json
import time

import numpy as np


def fetch(x):
    np.asarray(x)


def timeit(fn, *a, iters=5):
    out = fn(*a); fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a); fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from distil_whisper_tpu.config import PRESETS
    from distil_whisper_tpu.models import init_params
    from distil_whisper_tpu.models.whisper import _conv1d

    cfg = PRESETS["large-v3"]
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    enc = params["encoder"]
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((16, cfg.num_mel_bins, 3000)),
                      jnp.bfloat16)

    def gelu_exact(x):
        return jax.nn.gelu(x, approximate=False)

    def gelu_tanh(x):
        return jax.nn.gelu(x, approximate=True)

    def conv_taps(p, x, stride):
        # x [B, T, C]; kernel (3, C_in, C_out); SAME-1 padding like torch.
        k = p["kernel"].astype(x.dtype)
        b, t, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        t_out = t // stride
        acc = None
        for d in range(3):
            xs = jax.lax.slice_in_dim(xp, d, d + t, axis=1)
            if stride > 1:
                xs = xs[:, ::stride]
            y = jnp.einsum("bti,io->bto", xs, k[d],
                           preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        return (acc.astype(x.dtype) + p["bias"].astype(x.dtype))[:, :t_out]

    def conv_im2col(p, x, stride):
        k = p["kernel"].astype(x.dtype)
        b, t, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        cols = jnp.stack(
            [jax.lax.slice_in_dim(xp, d, d + t, axis=1)[:, ::stride]
             for d in range(3)], axis=2)          # [B, T/stride, 3, C]
        y = jnp.einsum("btdc,dco->bto", cols, k,
                       preferred_element_type=jnp.float32)
        return y.astype(x.dtype) + p["bias"].astype(x.dtype)

    def make_stem(conv, act):
        def stem(p, mel):
            x = mel.transpose(0, 2, 1)
            x = act(conv(p["conv1"], x, 1))
            x = act(conv(p["conv2"], x, 2))
            return x[:, :2, :2]
        return jax.jit(stem)

    def conv_xla(p, x, stride):
        return _conv1d(p, x, stride)

    res = {}
    for name, conv, act in [
        ("conv_xla", conv_xla, gelu_exact),
        ("conv_xla_tanh", conv_xla, gelu_tanh),
        ("conv_taps", conv_taps, gelu_exact),
        ("conv_taps_tanh", conv_taps, gelu_tanh),
        ("conv_im2col", conv_im2col, gelu_exact),
        ("stem_only_convs", conv_taps, lambda x: x),
        ("stem_xla_only_convs", conv_xla, lambda x: x),
    ]:
        try:
            t = timeit(make_stem(conv, act), enc, mel)
            res[name] = round(t * 1e3, 2)
            print(name, res[name], "ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(name, "FAILED", str(e)[:200], flush=True)

    # numerics check vs the XLA path (CPU-exact comparison happens in tests;
    # here just confirm on-chip bf16 agreement scale)
    f_ref = jax.jit(lambda p, m: conv_xla(p["conv1"], m.transpose(0, 2, 1), 1))
    f_new = jax.jit(lambda p, m: conv_taps(p["conv1"], m.transpose(0, 2, 1), 1))
    d = jnp.max(jnp.abs(f_ref(enc, mel).astype(jnp.float32)
                        - f_new(enc, mel).astype(jnp.float32)))
    res["conv1_taps_maxdiff"] = float(d)
    print("conv1 taps max|diff| vs xla:", float(d), flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
