"""A/B the U-ViT-huge attention site on the chip: [64, 258, 16, 72].

The r5 U-ViT profile (profile_uvit.py) shows XLA attention materializing the
f32 [64,16,258,258] logits to HBM: ~0.81 ms (QK+max) + 0.55 ms (softmax) +
~0.8 ms (AV) per block x 29 blocks ≈ 60 ms of the 188 ms forward, vs ~0.1 ms
ideal. Variants:

  xla        — current dispatch (materialized logits)
  slice72    — Pallas lane-slice path with S padded 258->264, head slices at
               unaligned lane offsets (DU_TPU_ATTN_SLICE_ANY_D)
  fold128    — Pallas fold path: [B,H,S,Dp] transpose + D 72->128 pad
               (the r3 whole-loop loser, re-measured at the site)
  padqkv     — lane-aligned packing: qkv produced directly as [B,S,H,128]
               with 56 zero columns per head (what the model would do if we
               pad the qkv/proj kernels), then the fast lane-slice kernel

    python scripts_dev/uvit_attn_microbench.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, S, H, D = 64, 258, 16, 72
ITERS = 50  # chained inside ONE jit: the axon relay's ~100 ms per-dispatch
# overhead swamps single-op wall timings, so feed each call's output back as
# the next query and measure 50 device iterations per dispatch


def timeit(name, fn, q, k, v):
    @jax.jit
    def loop(q, k, v):
        def body(c, _):
            return fn(c, k, v).astype(c.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=ITERS)
        return out

    out = loop(q, k, v)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = loop(q, k, v)
    float(jnp.sum(out[0, 0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps / ITERS
    print(f"{name:10s} {dt*1e3:8.3f} ms/site-call", flush=True)
    return dt


def main():
    from diffusion_uncertainty_tpu.ops.attention import _xla_attention
    from diffusion_uncertainty_tpu.ops.flash_attention import flash_attention

    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)

    ref = None

    def check(name, out, s_real=S):
        nonlocal ref
        o = np.asarray(out[:, :s_real].astype(jnp.float32))
        if ref is None:
            ref = o
            return
        err = np.max(np.abs(o - ref))
        print(f"  {name} max|diff| vs xla = {err:.4f}", flush=True)

    f_xla = jax.jit(_xla_attention)
    check("xla", f_xla(q, k, v))
    timeit("xla", f_xla, q, k, v)

    # slice72: pad S to 264, unaligned lane slices
    os.environ["DU_TPU_ATTN_SLICE_ANY_D"] = "1"
    pad = ((0, 0), (0, 264 - S), (0, 0), (0, 0))
    qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    try:
        f_slice = jax.jit(lambda a, b, c: flash_attention(a, b, c, kv_len=S))
        out = f_slice(qp, kp, vp)
        check("slice72", out, s_real=S)
        timeit("slice72", f_slice, qp, kp, vp)
    except Exception as e:
        print(f"slice72 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
    os.environ.pop("DU_TPU_ATTN_SLICE_ANY_D", None)

    # fold128: the default non-aligned path (transpose + pad to 128 lanes)
    try:
        f_fold = jax.jit(lambda a, b, c: flash_attention(a, b, c, kv_len=S))
        out = f_fold(qp, kp, vp)
        check("fold128", out, s_real=S)
        timeit("fold128", f_fold, qp, kp, vp)
    except Exception as e:
        print(f"fold128 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # padqkv: inputs already [B, 264, H, 128] with zero cols; the kernel's
    # lane-aligned path; scale must still be 72^-0.5 so emulate by pre-scaling q
    dpad = ((0, 0), (0, 0), (0, 0), (0, 128 - D))
    q128 = jnp.pad(qp * (72.0 ** -0.5) * (128.0 ** 0.5), dpad).astype(jnp.bfloat16)
    k128, v128 = jnp.pad(kp, dpad), jnp.pad(vp, dpad)
    try:
        f_p = jax.jit(lambda a, b, c: flash_attention(a, b, c, kv_len=S))
        out = f_p(q128, k128, v128)
        check("padqkv", out[..., :D], s_real=S)
        timeit("padqkv", f_p, q128, k128, v128)
    except Exception as e:
        print(f"padqkv FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
