"""Print the top self-time op buckets of a captured .xplane.pb.

NOTE: async DMA ops (slice-start/copy-start) report their full SPAN, which
overlaps compute — use tools/xplane_timeline.py for an overlap-deduped
occupancy view. Control-flow wrappers (while/conditional/call) are skipped
since their time double-counts their bodies.

Usage: python tools/parse_xplane.py [glob] [n_buckets]
"""
import collections
import sys

from xplane_common import load_xspace, parse


def main() -> None:
    topn = next((int(a) for a in sys.argv[1:] if a.isdigit()), 30)
    space = load_xspace(sys.argv[1:])
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        by_op = collections.Counter()
        by_name = collections.Counter()
        total = 0
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                opcode, short = parse(meta.get(ev.metadata_id, "?"))
                if opcode in ("while", "conditional", "call"):
                    continue
                by_op[opcode] += ev.duration_ps
                by_name[(opcode, short)] += ev.duration_ps
                total += ev.duration_ps
        if not total:
            continue
        print(f"== plane: {plane.name}  op self-time total {total/1e9:.1f} ms ==")
        print("-- by opcode --")
        for k, v in by_op.most_common(topn):
            print(f"  {v/1e9:9.2f} ms  {100*v/total:5.1f}%  {k}")
        print("-- top individual ops --")
        for (op, short), v in by_name.most_common(topn):
            print(f"  {v/1e9:9.2f} ms  {100*v/total:5.1f}%  [{op}] {short[:90]}")


if __name__ == "__main__":
    main()
