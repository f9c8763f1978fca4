"""Parse a captured .xplane.pb directly and print the top self-time op buckets.

The tensorboard_plugin_profile converter is version-broken in this image
(protobuf descriptor mismatch); `tensorflow.tsl.profiler.protobuf.xplane_pb2`
parses the raw xplane fine. Events on the "XLA Ops" device line carry full HLO
texts; we extract the opcode + short name, skip control-flow wrappers (their
time double-counts their bodies), and aggregate self-time.

Usage: python tools/parse_xplane.py [glob] [n_buckets]
"""
import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2

_OPCODE = re.compile(r"=\s*[a-z0-9\[\],{}:*/ ()]*?\s*([a-z][a-z0-9-]*)\(")
_SHORT = re.compile(r"^%?([^ =]+)")


def parse(name: str):
    short = _SHORT.match(name)
    short = short.group(1) if short else name[:40]
    m = _OPCODE.search(name)
    opcode = m.group(1) if m else short.split(".")[0].lstrip("%")
    return opcode, short


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.isdigit()]
    topn = int([a for a in sys.argv[1:] if a.isdigit()][0]) if any(
        a.isdigit() for a in sys.argv[1:]) else 30
    paths = []
    for a in args:
        paths.extend(glob.glob(a, recursive=True))
    if not paths:
        paths = sorted(glob.glob("/tmp/jaxtrace/**/*.xplane.pb", recursive=True))
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(paths[-1], "rb").read())
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
                name = meta.get(ev.metadata_id, "?")
                opcode, short = parse(name)
                if opcode in ("while", "conditional", "call"):
                    continue  # wrappers double-count their bodies
                dur = ev.duration_ps
                by_op[opcode] += dur
                by_name[(opcode, short)] += dur
                total += dur
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
