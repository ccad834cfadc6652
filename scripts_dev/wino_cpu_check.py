"""CPU interpret-mode correctness check for ops/winograd_conv.py."""
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from diffusion_uncertainty_tpu.ops import winograd_conv as wc


def check(n, h, w, c, k, res=False, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, h, w, c), dtype)
    wt = jnp.asarray(rng.randn(3, 3, c, k) * 0.05, dtype)
    b = jnp.asarray(rng.randn(k) * 0.1, dtype)
    r = jnp.asarray(rng.randn(n, h, w, k), dtype) if res else None
    ref = wc._reference_conv(x, wt, b, r)
    got = wc.conv3x3_winograd(x, wt, b, r, use_pallas=True)
    d = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32)))
    scale = np.max(np.abs(np.asarray(ref, np.float32)))
    print(f"n={n} h={h} w={w} c={c} k={k} res={res} {np.dtype(np.float32).name if dtype==jnp.float32 else 'bf16'}: max|d|={d:.3e} rel={d/scale:.3e}")
    return d / scale


if __name__ == "__main__":
    bad = 0
    for args in [
        dict(n=8, h=8, w=16, c=128, k=128),
        dict(n=8, h=8, w=16, c=128, k=128, res=True),
        dict(n=8, h=12, w=32, c=128, k=256),
        dict(n=16, h=8, w=16, c=128, k=128, dtype=jnp.bfloat16),
        dict(n=8, h=8, w=16, c=128, k=128, res=True, dtype=jnp.bfloat16),
    ]:
        rel = check(**args)
        tol = 1e-5 if args.get("dtype", jnp.float32) == jnp.float32 else 3e-2
        if rel > tol:
            bad += 1
            print("  ^^ FAIL")
    # vmap fold rule
    x = jnp.asarray(np.random.randn(3, 8, 8, 16, 128), jnp.float32)
    wt = jnp.asarray(np.random.randn(3, 3, 128, 128) * 0.05, jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    got = jax.vmap(lambda xi: wc.conv3x3_winograd(xi, wt, b, None, use_pallas=True))(x)
    ref = jax.vmap(lambda xi: wc._reference_conv(xi, wt, b, None))(x)
    d = float(jnp.max(jnp.abs(got - ref)))
    print(f"vmap fold: max|d|={d:.3e}")
    bad += d > 1e-4
    # grad path (XLA-math VJP)
    gfn = jax.grad(lambda xx: jnp.sum(wc.conv3x3_winograd(xx, wt, b, None, use_pallas=True) ** 2))
    gref = jax.grad(lambda xx: jnp.sum(wc._reference_conv(xx, wt, b, None) ** 2))
    xx = jnp.asarray(np.random.randn(8, 8, 16, 128), jnp.float32)
    d = float(jnp.max(jnp.abs(gfn(xx) - gref(xx))))
    print(f"vjp: max|d|={d:.3e}")
    bad += d > 1e-3
    print("FAIL" if bad else "ALL OK")
