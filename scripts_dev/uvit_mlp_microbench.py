"""A/B the U-ViT MLP block epilogues on the chip: [64*258, 1152] x 4.0 ratio.

profile_uvit.py shows the big matmul fusions (add_add / convert_reduce, i.e.
fc2+residual and matmul+LN-stats) running ~30-50% MFU while the plain qkv
matmul hits 82%. Suspects: the f32 exact-erf GELU epilogue on the fc1 output
(76M elements) and the f32 LN-stats reduce fused into matmuls. Variants time
one full pre-LN MLP residual (LN -> fc1 -> gelu -> fc2 -> add):

  gelu_f32_exact   — current model code (gelu in f32, erf)
  gelu_bf16_exact  — erf gelu computed in bf16 (matches torch-autocast parity)
  gelu_bf16_tanh   — tanh approximation in bf16 (perf reference point)
  matmuls_only     — fc1+fc2 without gelu/LN (fusion MFU ceiling)

    python scripts_dev/uvit_mlp_microbench.py
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, S, DM = 64, 258, 1152
HID = 4 * DM
ITERS = 30
FLOPS = 2 * B * S * DM * HID * 2  # fc1 + fc2


def timeit(name, fn, x, *args):
    # chained inside one jit: the axon relay's ~100 ms per-dispatch overhead
    # swamps per-call wall timings
    @jax.jit
    def loop(x, *args):
        def body(c, _):
            return fn(c, *args).astype(c.dtype) * 0.5, None  # *0.5 bounds the chain

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out

    out = loop(x, *args)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = loop(x, *args)
    float(jnp.sum(out[0, 0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps / ITERS
    print(f"{name:18s} {dt*1e3:8.3f} ms  ({FLOPS/dt/1e12:6.1f} TFLOP/s)", flush=True)
    return dt


def main():
    kx, k1, k2 = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (B, S, DM), jnp.bfloat16)
    w1 = (jax.random.normal(k1, (DM, HID), jnp.float32) * 0.02).astype(jnp.bfloat16)
    w2 = (jax.random.normal(k2, (HID, DM), jnp.float32) * 0.02).astype(jnp.bfloat16)
    b1 = jnp.zeros((HID,), jnp.bfloat16)
    b2 = jnp.zeros((DM,), jnp.bfloat16)
    g = jnp.ones((DM,), jnp.float32)
    be = jnp.zeros((DM,), jnp.float32)

    def ln(h):
        hf = h.astype(jnp.float32)
        mu = hf.mean(-1, keepdims=True)
        var = hf.var(-1, keepdims=True)
        return ((hf - mu) * jax.lax.rsqrt(var + 1e-5) * g + be)

    def block(gelu):
        def f(x, w1, b1, w2, b2):
            h = ln(x).astype(jnp.bfloat16)
            h = h @ w1 + b1
            h = gelu(h)
            h = h @ w2 + b2
            return x + h
        return jax.jit(f)

    gelu_f32 = lambda h: jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(jnp.bfloat16)
    gelu_bf16 = lambda h: jax.nn.gelu(h, approximate=False)
    gelu_tanh = lambda h: jax.nn.gelu(h, approximate=True)

    timeit("gelu_f32_exact", block(gelu_f32), x, w1, b1, w2, b2)
    timeit("gelu_bf16_exact", block(gelu_bf16), x, w1, b1, w2, b2)
    timeit("gelu_bf16_tanh", block(gelu_tanh), x, w1, b1, w2, b2)

    mm = jax.jit(lambda x, w1, b1, w2, b2: (x @ w1 + b1) @ w2 + b2 + x)
    timeit("matmuls_only", mm, x, w1, b1, w2, b2)

    # numerics: bf16-exact vs f32-exact gelu on the real distribution
    import numpy as np

    a = np.asarray(block(gelu_f32)(x, w1, b1, w2, b2).astype(jnp.float32))
    b_ = np.asarray(block(gelu_bf16)(x, w1, b1, w2, b2).astype(jnp.float32))
    print(f"bf16-exact vs f32-exact gelu: max|diff|={np.abs(a-b_).max():.5f} "
          f"rms={np.sqrt(((a-b_)**2).mean()):.6f} (|x| rms={np.sqrt((a**2).mean()):.4f})",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
