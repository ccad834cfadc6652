"""Winograd-vs-direct conv microbenchmark at the ADM-128 b48 conv shapes.

Times the F(2,3) pallas kernel against XLA's direct conv (bias + optional
fused residual add, matching what the model actually emits) per level, so the
``_tile_params`` dispatch gate can be grounded in measured numbers instead of
a roofline guess. Run ON the chip:

    python scripts_dev/wino_microbench.py [M_target]
"""

import sys
import time

import jax
import jax.numpy as jnp

if len(sys.argv) > 1:
    import os

    os.environ["DU_TPU_WINO_M"] = sys.argv[1]

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffusion_uncertainty_tpu.ops import winograd_conv as wc

B = 48
# (side, cin, cout, has_res, multiplicity) — ADM-128 3x3/s1 conv sites
SITES = [
    (128, 256, 256, False, 3),
    (128, 256, 256, True, 2),
    (64, 256, 256, False, 2),
    (64, 256, 512, True, 1),
    (64, 512, 512, False, 2),
    (64, 512, 512, True, 2),
    (32, 512, 512, False, 3),
    (32, 512, 1024, True, 1),
    (32, 1024, 1024, False, 3),
    (32, 1024, 1024, True, 3),
    (16, 1024, 1024, False, 4),
    (16, 1024, 1024, True, 4),
    (8, 1024, 1024, False, 3),
    (8, 1024, 1024, True, 3),
]


def timeit(f, *args, reps=15):
    out = f(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    float(jnp.sum(out[0, 0, 0]))  # host readback sync
    return (time.perf_counter() - t0) / reps


def run():
    tot_d = tot_w = 0.0
    for side, cin, cout, has_res, mult in SITES:
        k0, k1, k2 = jax.random.split(jax.random.key(side * cin + cout), 3)
        x = jax.random.normal(k0, (B, side, side, cin), jnp.bfloat16)
        w = (0.05 * jax.random.normal(k1, (3, 3, cin, cout), jnp.float32)).astype(jnp.bfloat16)
        b = jnp.zeros((cout,), jnp.bfloat16)
        res = (
            jax.random.normal(k2, (B, side, side, cout), jnp.bfloat16) if has_res else None
        )

        direct = jax.jit(
            lambda xx, rr=None: wc.conv3x3_winograd(xx, w, b, rr, use_pallas=False)
        )
        t_d = timeit(direct, x, res) if has_res else timeit(direct, x)

        params = wc._tile_params(B, side, side, cin, cout, has_res)
        sup = wc.supports(x.shape, w.shape, (1, 1), (1, 1), has_res)
        if params is None or not sup:
            line = "   (gate: fallback)"
            t_w = float("nan")
        else:
            wino = jax.jit(
                lambda xx, rr=None: wc.conv3x3_winograd(xx, w, b, rr, use_pallas=True)
            )
            try:
                t_w = timeit(wino, x, res) if has_res else timeit(wino, x)
                line = f"{t_w*1e3:8.3f} ms  ({t_d/t_w:4.2f}x)  tile={params}"
            except Exception as e:  # noqa: BLE001
                t_w = float("nan")
                line = f"   FAIL {type(e).__name__}: {str(e)[:80]}"
        tot_d += t_d * mult
        tot_w += (t_w if t_w == t_w else t_d) * mult
        print(
            f"{side:4d}^2 {cin:4d}->{cout:4d} res={int(has_res)} x{mult}: "
            f"direct {t_d*1e3:8.3f} ms  wino {line}",
            flush=True,
        )
    print(f"TOTAL per fwd: direct {tot_d*1e3:.2f} ms, best-mix {tot_w*1e3:.2f} ms")


if __name__ == "__main__":
    print(jax.devices())
    run()
