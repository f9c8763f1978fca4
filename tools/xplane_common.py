"""Shared xplane parsing bits for the profiling tools.

The tensorboard_plugin_profile converter is version-broken in this image
(protobuf descriptor mismatch); `tensorflow.tsl.profiler.protobuf.xplane_pb2`
parses raw xplanes fine. HLO op names on the "XLA Ops" line carry the full
instruction text — `parse()` extracts (opcode, short_name) from it.
"""
import glob
import re

_OPCODE = re.compile(r"=\s*[a-z0-9\[\],{}:*/ ()]*?\s*([a-z][a-z0-9-]*)\(")
_SHORT = re.compile(r"^%?([^ =]+)")


def parse(name: str):
    """(opcode, short_name) from an HLO instruction text."""
    short = _SHORT.match(name)
    short = short.group(1) if short else name[:40]
    m = _OPCODE.search(name)
    opcode = m.group(1) if m else short.split(".")[0].lstrip("%")
    return opcode, short


def load_xspace(args, default_glob="/tmp/jaxtrace/**/*.xplane.pb"):
    """Parse the newest .xplane.pb matching the (non-numeric) CLI args."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = []
    for a in args:
        if not a.isdigit():
            paths.extend(glob.glob(a, recursive=True))
    if not paths:
        paths = sorted(glob.glob(default_glob, recursive=True))
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(paths[-1], "rb").read())
    return space
