"""Timeline-occupancy analysis of a captured .xplane.pb.

The per-op "self time" view misleads for async DMA (slice-start/copy-start
spans overlap compute). This computes, over the XLA Ops line:
  - wall = last end - first start
  - busy = union of SYNC op intervals (async *-start/*-done excluded)
  - gap  = wall - busy  (device idle or DMA-stalled time)
and attributes busy time to opcode buckets by interval union order.

Usage: python tools/xplane_timeline.py [glob]
"""
import collections
import sys

from xplane_common import load_xspace, parse


def main() -> None:
    space = load_xspace(sys.argv[1:])
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        sync = []  # (start_ps, end_ps, opcode)
        async_spans = []
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                opcode, _ = parse(name)
                s = ev.offset_ps
                e = s + ev.duration_ps
                if opcode in ("while", "conditional", "call"):
                    continue
                if opcode.endswith("-start") or opcode.endswith("-done") or opcode.endswith("-update"):
                    async_spans.append((s, e, opcode))
                else:
                    sync.append((s, e, opcode))
        if not sync:
            continue
        sync.sort()
        wall_s = min(s for s, _, _ in sync + async_spans)
        wall_e = max(e for _, e, _ in sync + async_spans)
        wall = wall_e - wall_s
        busy = 0
        by_op = collections.Counter()
        cur_e = 0
        for s, e, op in sync:
            if e <= cur_e:
                continue
            seg = e - max(s, cur_e)
            busy += seg
            by_op[op] += seg
            cur_e = e
        print(f"== {plane.name} ==")
        print(f"wall  {wall/1e9:9.1f} ms")
        print(f"busy  {busy/1e9:9.1f} ms  ({100*busy/wall:.1f}% occupancy, sync compute)")
        print(f"gap   {(wall-busy)/1e9:9.1f} ms  (idle / DMA-stall)")
        print("-- busy by opcode (overlap-deduped) --")
        for k, v in by_op.most_common(25):
            print(f"  {v/1e9:9.2f} ms  {100*v/wall:5.1f}% of wall  {k}")
        # Which async opcodes are live during the gaps? Only material gaps
        # (>10 µs) are attributed — the naive all-gaps × all-spans cross
        # product is O(1e9+) and never finishes on a real trace.
        gaps = []
        cur_e = wall_s
        for s, e, _ in sync:
            if s > cur_e:
                gaps.append((cur_e, s))
            cur_e = max(cur_e, e)
        if cur_e < wall_e:
            gaps.append((cur_e, wall_e))
        big_gaps = sorted((g for g in gaps if g[1] - g[0] > 10_000_000),
                          key=lambda g: g[1] - g[0], reverse=True)[:200]
        gap_cover = collections.Counter()
        for gs, ge in big_gaps:
            for s, e, op in async_spans:
                ov = min(e, ge) - max(s, gs)
                if ov > 0:
                    gap_cover[op] += ov
        print("-- async spans live during gaps >10µs "
              "(may multi-count parallel DMAs) --")
        for k, v in gap_cover.most_common(10):
            print(f"  {v/1e9:9.2f} ms  {k}")
        print("-- largest gaps --")
        for gs, ge in big_gaps[:10]:
            print(f"  {(ge-gs)/1e9:9.2f} ms at +{(gs-wall_s)/1e9:.1f} ms")


if __name__ == "__main__":
    main()
