"""Aggregate a jax.profiler xplane trace into per-op self-time totals.

Usage: python scripts/exp_parse_trace.py /tmp/prof_step_bf16 [top_n]
Parses the /device:TPU:0 plane (XLA op events) and prints the top-N op
names by total duration, grouping fusions by their root op kind.
"""
import collections
import glob
import sys


def main():
    logdir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        meta = {m.id: m.name for m in p.event_metadata.values()}
        totals = collections.Counter()
        counts = collections.Counter()
        line_totals = {}
        for line in p.lines:
            t = sum(e.duration_ps for e in line.events) / 1e12
            line_totals[line.name] = (t, len(line.events))
            for e in line.events:
                name = meta.get(e.metadata_id, str(e.metadata_id))
                totals[name] += e.duration_ps / 1e12
                counts[name] += 1
        print(f"# plane {p.name}")
        for ln, (t, n) in line_totals.items():
            print(f"#   line {ln!r}: {t*1000:.1f} ms over {n} events")
        grand = sum(totals.values())
        print(f"# total op time (all lines): {grand*1000:.1f} ms")
        for name, t in totals.most_common(top_n):
            print(f"{t*1000:9.2f} ms  x{counts[name]:<5d} {name[:120]}")


if __name__ == "__main__":
    main()
