"""Profile the WHOLE ADM-128 b48 sampling loop on the chip.

Same xplane attribution as profile_fwd.py but over one full 50-step M=5
zigzag-centered sampling invocation (200 forward-equivalents), so the
difference vs 200x the standalone forward time is attributable: scheduler
math, estimator variance reductions, re-noise RNG draws, uncertainty
accumulation, scan plumbing.

    python scripts_dev/profile_loop.py [batch]
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

from diffusion_uncertainty_tpu.diffusion import SamplerConfig, make_schedule, sample_ddim
from diffusion_uncertainty_tpu.models import ADMUNet, ADMUNetConfig
from diffusion_uncertainty_tpu.uncertainty import EstimatorConfig, make_estimator

B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
FWD_EQUIV = 50 + 10 * 5 * 3  # steps + window*M*zigzag


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

    def model_fn_of(p):
        return lambda xx, tt, key: model.apply(p, xx, tt, y)[..., :3]

    schedule = make_schedule("linear", 1000)
    scfg = SamplerConfig(num_inference_steps=50, after_step=40, num_steps_uc=10)
    est = make_estimator(
        EstimatorConfig(name="uncertainty_zigzag_centered", M=5, num_zigzag=3, ensemble_chunk=1)
    )
    sample_jit = jax.jit(
        lambda p, xT, key: sample_ddim(model_fn_of(p), schedule, xT, key, scfg, estimator=est),
        donate_argnums=(1,),
    )

    def new_x(i):
        return jax.random.normal(jax.random.key(10 + i), x.shape, jnp.bfloat16)

    t0 = time.perf_counter()
    res = sample_jit(params, new_x(0), jax.random.key(2))
    jax.block_until_ready(res.sample)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    res = sample_jit(params, new_x(1), jax.random.key(3))
    float(jnp.sum(res.sample[0, 0, 0]))
    wall = time.perf_counter() - t0
    print(
        f"loop wall: {wall:.2f}s = {wall/FWD_EQUIV*1e3:.1f} ms/fwd-equiv "
        f"-> {B/wall:.3f} imgs/sec",
        file=sys.stderr,
    )

    tmp = tempfile.mkdtemp(prefix="xprof_loop_")
    jax.profiler.start_trace(tmp)
    res = sample_jit(params, new_x(2), jax.random.key(4))
    float(jnp.sum(res.sample[0, 0, 0]))
    jax.profiler.stop_trace()

    files = glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True)
    print(f"xplane: {files}", file=sys.stderr)
    import importlib.util
    import os
    import site

    pb2_path = None
    for sp in site.getsitepackages():
        cand = f"{sp}/tensorflow/tsl/profiler/protobuf/xplane_pb2.py"
        if os.path.exists(cand):
            pb2_path = cand
            break
    spec = importlib.util.spec_from_file_location("xplane_pb2", pb2_path)
    xplane_pb2 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(xplane_pb2)

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[0], "rb").read())
    groups = collections.Counter()
    total = 0.0
    per_op = collections.Counter()
    for plane in xs.planes:
        if plane.name != "/device:TPU:0":
            continue
        ev_meta = plane.event_metadata
        st_meta = plane.stat_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                cat = None
                for s in md.stats:
                    if st_meta[s.metadata_id].name == "hlo_category":
                        cat = s.str_value
                if cat in ("async-start", "async-done"):
                    continue
                name = md.name
                dur = ev.duration_ps / 1e12
                total += dur
                per_op[name] += dur
                n = name.lower()
                if "flash_attention" in n:
                    groups["pallas_attention"] += dur
                elif cat == "custom-call":
                    groups["pallas_gn"] += dur
                elif cat == "convolution fusion":
                    groups["conv_fusion"] += dur
                elif "rng" in n or "threefry" in n:
                    groups["rng"] += dur
                elif cat in ("data formatting",) or "transpose" in n or "copy" in (cat or ""):
                    groups["layout/copy"] += dur
                else:
                    groups[cat or "other"] += dur
    print(
        f"\ntotal device time over 1 loop: {total*1e3:.1f} ms "
        f"({total/FWD_EQUIV*1e3:.2f} ms/fwd-equiv; wall {wall/FWD_EQUIV*1e3:.2f})"
    )
    for k, v in groups.most_common():
        print(f"  {k:20s} {v/FWD_EQUIV*1e3:8.3f} ms/fwd-equiv  ({v*1e3:9.1f} ms total)")
    print("\ntop 30 ops:")
    for name, v in per_op.most_common(30):
        print(f"  {v*1e3:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
