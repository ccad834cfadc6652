"""GroupNorm kernel microbenchmark at the ADM-128 b48 site shapes.

Reports per-site wall time and effective HBM bandwidth (2R+1W model) for the
HWNC kernel, to locate the gap between the profiled 50.8 ms/forward and the
~33 ms ideal (ROADMAP perf attribution). Run ON the chip:

    python scripts_dev/gn_microbench.py [tile_budget_bytes]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if len(sys.argv) > 1:
    import os

    os.environ["DU_TPU_GN_TILE_BUDGET"] = sys.argv[1]

from diffusion_uncertainty_tpu.ops.groupnorm import group_norm_silu

B = 48
# (side, channels, scale_shift) — the ADM-128 GN sites (2 per ResBlock at each
# level + attention entries); counts approximate the per-forward multiplicity
SITES = [
    (128, 256, 5),
    (64, 256, 5),
    (64, 512, 2),
    (32, 512, 6),
    (32, 1024, 2),
    (16, 1024, 8),
    (8, 1024, 6),
]


def run():
    total = 0.0
    total_ideal = 0.0
    for side, c, mult in SITES:
        x = jax.random.normal(jax.random.key(0), (B, side, side, c), jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        scale = jnp.zeros((B, c), jnp.bfloat16)
        shift = jnp.zeros((B, c), jnp.bfloat16)

        f = jax.jit(lambda a, s, t: group_norm_silu(a, gamma, beta, scale=s, shift=t))
        out = f(x, scale, shift)
        out.block_until_ready()
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(x, scale, shift)
        float(jnp.sum(out[0, 0, 0]))  # host readback sync
        dt = (time.perf_counter() - t0) / reps
        bytes_3pass = 3 * x.size * 2
        bw = bytes_3pass / dt / 1e9
        ideal = bytes_3pass / 819e9
        total += dt * mult
        total_ideal += ideal * mult
        print(
            f"{side:4d}^2 x{c:5d}: {dt*1e3:7.3f} ms  {bw:6.0f} GB/s eff (x{mult} -> {dt*mult*1e3:6.2f} ms/fwd, ideal {ideal*mult*1e3:5.2f})"
        )
    print(f"TOTAL per forward: {total*1e3:.2f} ms (ideal {total_ideal*1e3:.2f} ms)")


if __name__ == "__main__":
    print(jax.devices())
    run()
