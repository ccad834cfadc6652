"""Shared xplane-proto parsing for the profiling microbenches.

Loads the tensorflow xplane pb2 module directly (importing `tensorflow`
itself fails in this image; the generated pb2 only needs protobuf) and
aggregates leaf-op device time into kernel-family buckets.
"""

import collections
import glob
import importlib.util
import os
import site


def _load_xplane_pb2():
    pb2_path = None
    for sp in site.getsitepackages():
        cand = f"{sp}/tensorflow/tsl/profiler/protobuf/xplane_pb2.py"
        if os.path.exists(cand):
            pb2_path = cand
            break
    spec = importlib.util.spec_from_file_location("xplane_pb2", pb2_path)
    xplane_pb2 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(xplane_pb2)
    return xplane_pb2


def parse_trace(trace_dir, n_iters, top_n=40):
    """Parse the newest xplane under trace_dir; print per-bucket and per-op
    device time divided by n_iters."""
    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    xplane_pb2 = _load_xplane_pb2()
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
                    bucket = "pallas_custom"
                elif cat == "convolution fusion":
                    bucket = "conv_fusion"
                elif cat in ("data formatting",) or "transpose" in n or "copy" in (cat or ""):
                    bucket = "layout/copy"
                else:
                    bucket = cat or "other"
                groups[bucket] += dur
                per_op_bucket.setdefault(bucket, collections.Counter())[name] += dur
    print(f"\ntotal device time over {n_iters} it: {total*1e3:.1f} ms ({total/n_iters*1e3:.2f}/it)")
    for k, v in groups.most_common():
        print(f"  {k:20s} {v/n_iters*1e3:8.2f} ms/it")

    # family rollup: strip the .N instance suffix and the %-prefix so the 29
    # per-block clones of one op aggregate into a single accountable line
    import re

    fam = collections.Counter()
    fam_n = collections.Counter()
    for name, v in per_op.items():
        base = re.sub(r"\.\d+$", "", name.split(" = ")[0].lstrip("%"))
        fam[base] += v
        fam_n[base] += 1
    print("\nop families (sum/it, count):")
    for base, v in fam.most_common(top_n):
        print(f"  {v/n_iters*1e3:8.3f} ms  x{fam_n[base]:<4d} {base[:110]}")

    print(f"\ntop {top_n} ops:")
    for name, v in per_op.most_common(top_n):
        print(f"  {v/n_iters*1e3:8.3f} ms  {name[:130]}")
    print("\nper-bucket top ops:")
    for bucket, members in per_op_bucket.items():
        print(f"  [{bucket}]")
        for name, v in members.most_common(8):
            print(f"    {v/n_iters*1e3:8.3f} ms  {name[:120]}")
    return groups, per_op
