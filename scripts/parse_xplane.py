#!/usr/bin/env python3
"""Print the per-op time table from a jax.profiler xplane capture.

Usage: python scripts/parse_xplane.py TRACE_DIR [N_ITERS]
(docs/PERF.md op-level profile recipe, factored out of the probes.)
"""

import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def per_op_table(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    fs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not fs:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(fs[-1], "rb").read())
    per_op = {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        md = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = md.get(ev.metadata_id, "?")
                rec = per_op.setdefault(name, [0, 0])
                rec[0] += ev.duration_ps
                rec[1] += 1
    return per_op


def main():
    trace_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    per_op = per_op_table(trace_dir)
    total = sum(v[0] for v in per_op.values())
    print(f"total device op time {total/1e12*1e3:.1f} ms "
          f"({total/1e12*1e3/n:.2f} ms/iter over {n})")
    for name, (ps, cnt) in sorted(per_op.items(), key=lambda kv: -kv[1][0]):
        ms = ps / 1e12 * 1e3
        if ms < 0.01 * n:
            break
        print(f"  {ms/n:8.2f} ms/iter x{cnt:4d}  {name[:100]}")


if __name__ == "__main__":
    main()
