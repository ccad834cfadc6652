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

from diffusion_uncertainty_tpu.models import ADMUNet, ADMUNetConfig

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

    files = glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True)
    print(f"xplane: {files}", file=sys.stderr)
    # load the xplane proto module directly (importing `tensorflow` itself
    # fails in this image; the generated pb2 only needs protobuf)
    import importlib.util
    import site

    pb2_path = None
    for sp in site.getsitepackages():
        cand = f"{sp}/tensorflow/tsl/profiler/protobuf/xplane_pb2.py"
        import os

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
    per_op_bucket = {}
    for plane in xs.planes:
        if plane.name != "/device:TPU:0":
            continue
        ev_meta = plane.event_metadata
        st_meta = plane.stat_metadata
        for line in plane.lines:
            # the leaf-op line; "XLA Modules" aggregates would double-count
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                cat = None
                for s in md.stats:
                    if st_meta[s.metadata_id].name == "hlo_category":
                        cat = s.str_value
                if cat in ("async-start", "async-done"):
                    continue  # overlapped DMA bookkeeping, not device time
                name = md.name
                dur = ev.duration_ps / 1e12
                total += dur
                per_op[name] += dur
                n = name.lower()
                if "flash_attention" in n:
                    bucket = "pallas_attention"
                elif cat == "custom-call":
                    bucket = "pallas_gn"
                elif cat == "convolution fusion":
                    bucket = "conv_fusion"
                elif cat in ("data formatting",) or "transpose" in n or "copy" in (cat or ""):
                    bucket = "layout/copy"
                else:
                    bucket = cat or "other"
                groups[bucket] += dur
                per_op_bucket.setdefault(bucket, collections.Counter())[name] += dur
    print(f"\ntotal device time over 3 fwd: {total*1e3:.1f} ms ({total/3*1e3:.1f}/fwd)")
    for k, v in groups.most_common():
        print(f"  {k:20s} {v/3*1e3:8.2f} ms/fwd")
    print("\ntop 40 ops:")
    for name, v in per_op.most_common(40):
        print(f"  {v/3*1e3:8.3f} ms  {name[:130]}")
    print("\nper-bucket top ops:")
    for bucket in ("loop fusion", "layout/copy", "broadcast", "non-fusion elementwise", "pallas_gn"):
        members = per_op_bucket.get(bucket)
        if not members:
            continue
        print(f"  [{bucket}]")
        for name, v in members.most_common(8):
            print(f"    {v/3*1e3:8.3f} ms  {name[:120]}")


if __name__ == "__main__":
    main()
