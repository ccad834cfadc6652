"""On-chip attention kernel microbench: whole-row vs loop vs XLA at the
model zoo's real site shapes, across q-block sizes.

    python scripts_dev/attn_microbench.py

Timing uses a host scalar readback (block_until_ready can return early for
donated-aliased outputs on this stack — CLAUDE.md).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

# (tag, B, S, H, D)  — ADM-128 b48 levels ×(blocks at that level), U-ViT, SD3
SITES = [
    ("adm 32^2 d128", 48, 1024, 4, 128),
    ("adm 16^2 d192", 48, 256, 4, 192),
    ("adm 8^2 d256", 48, 64, 4, 256),
    ("uvit256 S258", 64, 258, 16, 72),
    ("sd3 S1040", 4, 1040, 24, 64),
]


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0, 0]))  # host readback sync
    return (time.perf_counter() - t0) / iters


def main():
    from diffusion_uncertainty_tpu.ops.attention import dot_product_attention

    for tag, b, s, h, d in SITES:
        kq, kk, kv = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
        # ideal HBM time: 4 tensors streamed once at ~819 GB/s
        ideal_ms = 4 * q.size * 2 / 819e9 * 1e3

        xla = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, use_pallas=False))
        t_xla = bench(xla, q, k, v)

        results = [f"xla {t_xla*1e3:7.3f}"]
        for wr in ("1", "0"):
            os.environ["DU_TPU_ATTN_WHOLEROW"] = wr
            for bq in (128, 256, 512):
                if bq > s and s > 256:
                    continue
                os.environ["DU_TPU_ATTN_BQ"] = str(bq)
                pall = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, use_pallas=True))
                try:
                    t_p = bench(pall, q, k, v)
                    results.append(f"{'wr' if wr=='1' else 'lp'}/bq{bq} {t_p*1e3:7.3f}")
                except Exception as e:  # noqa: BLE001
                    results.append(f"{'wr' if wr=='1' else 'lp'}/bq{bq} FAIL({type(e).__name__})")
        os.environ.pop("DU_TPU_ATTN_WHOLEROW", None)
        os.environ.pop("DU_TPU_ATTN_BQ", None)
        if d % 128 and d % 8 == 0:
            # non-lane-aligned head dim: try the masked lane-slice path
            os.environ["DU_TPU_ATTN_SLICE_ANY_D"] = "1"
            pall = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, use_pallas=True))
            try:
                t_p = bench(pall, q, k, v)
                results.append(f"slice_d {t_p*1e3:7.3f}")
            except Exception as e:  # noqa: BLE001
                results.append(f"slice_d FAIL({type(e).__name__})")
            os.environ.pop("DU_TPU_ATTN_SLICE_ANY_D", None)
        print(f"{tag:16s} ideal {ideal_ms:6.3f} ms | " + " | ".join(results), flush=True)


if __name__ == "__main__":
    main()
