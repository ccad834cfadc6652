"""Profile ONE ADM-128 b48 forward on the chip and attribute device time.

Captures a jax.profiler trace of a few compiled forwards, parses the xplane
proto (tensorboard_plugin_profile), and prints leaf-op wall time grouped by
kernel family — the data behind ROADMAP's perf attribution table.

    python scripts_dev/profile_fwd.py [batch]
"""

import collections
import dataclasses
import glob
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "scripts_dev")
from diffusion_uncertainty_tpu.models import ADMUNet, ADMUNetConfig
from xplane import parse_trace

B = int(sys.argv[1]) if len(sys.argv) > 1 else 48


def main():
    cfg = dataclasses.replace(ADMUNetConfig.imagenet128(), dtype=jnp.bfloat16)
    model = ADMUNet(cfg)
    x = jnp.zeros((B, 128, 128, 3), jnp.bfloat16)
    t = jnp.asarray(500, jnp.int32)
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

    fwd = jax.jit(lambda p, xx: model.apply(p, xx, t, y)[..., :3])
    xr = jax.random.normal(jax.random.key(1), x.shape, jnp.bfloat16)
    out = fwd(params, xr)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fwd(params, xr)
    float(jnp.sum(out[0, 0, 0]))
    per_fwd = (time.perf_counter() - t0) / 3
    print(f"forward wall: {per_fwd*1e3:.1f} ms", file=sys.stderr)

    tmp = tempfile.mkdtemp(prefix="xprof_")
    jax.profiler.start_trace(tmp)
    for _ in range(3):
        out = fwd(params, xr)
    float(jnp.sum(out[0, 0, 0]))
    jax.profiler.stop_trace()
    parse_trace(tmp, 3)


if __name__ == "__main__":
    main()
