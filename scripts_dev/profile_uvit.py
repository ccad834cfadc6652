"""Profile ONE U-ViT-huge/2 (imagenet256 latents) forward at batch 64.

VERDICT r4 item 2: U-ViT-256 sits at 77.6 TFLOP/s (~39% MFU of 197 bf16
TFLOPS) with no published attribution. This captures the xplane trace of
the compiled forward and attributes device time by kernel family.

    python scripts_dev/profile_uvit.py [batch]
"""

import dataclasses
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "scripts_dev")
from diffusion_uncertainty_tpu.models import UViT, UViTConfig
from xplane import parse_trace

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
B = int(_pos[0]) if _pos else 64
ITERS = 4


def main():
    cfg = dataclasses.replace(UViTConfig.imagenet256(), dtype=jnp.bfloat16)
    model = UViT(cfg)
    x = jnp.zeros((B, 32, 32, 4), jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    shapes = jax.eval_shape(lambda k: model.init(k, x, t, y), jax.random.key(0))
    leaves, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def materialize(key):
        keys = jax.random.split(key, len(leaves))
        return jax.tree.unflatten(
            treedef,
            [
                (0.02 * jax.random.normal(k, s.shape, s.dtype)).astype(
                    jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
                )
                for k, s in zip(keys, leaves)
            ],
        )

    params = materialize(jax.random.key(0))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M", file=sys.stderr)

    fwd = jax.jit(lambda p, xx: model.apply(p, xx, t, y))
    xr = jax.random.normal(jax.random.key(1), x.shape, jnp.bfloat16)
    out = fwd(params, xr)
    jax.block_until_ready(out)
    flops = jax.jit(lambda p, xx: model.apply(p, xx, t, y)).lower(params, xr).compile().cost_analysis()["flops"]
    print(f"cost_analysis flops: {flops/1e9:.1f} GFLOP/batch ({flops/B/1e9:.2f}/img)", file=sys.stderr)

    # chained-scan wall timing: the axon relay's ~100 ms per-dispatch overhead
    # swamps per-call timings, so run LOOP forwards inside one jit
    LOOP = 10

    @jax.jit
    def loop(p, xx):
        def body(c, _):
            return model.apply(p, c, t, y).astype(jnp.bfloat16), None

        out, _ = jax.lax.scan(body, xx, None, length=LOOP)
        return out

    out = loop(params, xr)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = loop(params, xr)
    float(jnp.sum(out[0, 0, 0]))
    per_fwd = (time.perf_counter() - t0) / reps / LOOP
    print(
        f"forward (chained x{LOOP}): {per_fwd*1e3:.1f} ms -> {flops/per_fwd/1e12:.1f} TFLOP/s"
        f" ({flops/per_fwd/197e12*100:.1f}% MFU)",
        file=sys.stderr,
    )

    if "--trace" in sys.argv:
        tmp = tempfile.mkdtemp(prefix="xprof_uvit_")
        jax.profiler.start_trace(tmp)
        for _ in range(ITERS):
            out = fwd(params, xr)
        float(jnp.sum(out[0, 0, 0]))
        jax.profiler.stop_trace()
        parse_trace(tmp, ITERS)

    if "--trace-loop" in sys.argv:
        # scan-context attribution: the sampler wraps the model in lax.scan,
        # and kernels can behave differently there (buffer aliasing / DMA
        # pipelining), so trace the chained loop too
        tmp = tempfile.mkdtemp(prefix="xprof_uvit_loop_")
        jax.profiler.start_trace(tmp)
        out = loop(params, xr)
        float(jnp.sum(out[0, 0, 0]))
        jax.profiler.stop_trace()
        parse_trace(tmp, LOOP)


if __name__ == "__main__":
    main()
