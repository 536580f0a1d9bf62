"""Print top TPU ops by self-time from a jax.profiler xplane.pb.

Usage:
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/xplane_top_ops.py <trace_dir_or_pb> [top_n]

The tensorboard profile plugin in this image can't convert xplanes
(pywrap mismatch), so this parses the XSpace proto directly and
aggregates XLA-op event durations on the /device:TPU plane. Durations
are summed across all traced steps — divide by the number of traced
iterations for per-step cost.
"""

import glob
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    if not path.endswith(".pb"):
        pbs = sorted(glob.glob(path + "/**/*.xplane.pb", recursive=True))
        if not pbs:
            raise SystemExit(f"no xplane.pb under {path}")
        path = pbs[-1]

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            agg = defaultdict(float)
            counts = defaultdict(int)
            for ev in line.events:
                name = meta[ev.metadata_id].name
                agg[name] += ev.duration_ps / 1e9  # ms
                counts[name] += 1
            if not agg:
                continue
            total = sum(agg.values())
            print(f"\n== plane {plane.name} line '{line.name}' "
                  f"(total {total:.2f} ms over all steps) ==")
            for name, ms in sorted(agg.items(), key=lambda kv: -kv[1]
                                   )[:top_n]:
                print(f"{ms:9.3f} ms  x{counts[name]:<5d} {name[:90]}")


if __name__ == "__main__":
    main()
