"""Capture a device profile of the bench pipeline and print the op breakdown.

Usage: python tools/profile_pipeline.py [batch] — writes the trace under
/tmp/jaxtrace and prints the top self-time ops parsed from the xplane.
"""
import glob
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from tpu_claim import claim_tpu  # noqa: E402

claim_tpu()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import build  # noqa: E402
from ldiffusion_tpu.ops.quant import set_quant_mode  # noqa: E402

set_quant_mode(os.environ.get("BENCH_QUANT", "int8_static"))  # bench default
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
comps, fn, rep = build(B)
img = jnp.asarray(np.random.default_rng(0).normal(size=(B, 512, 512, 3)).astype(np.float32))
key = jax.random.key(0)
# warm up / compile outside the trace
_ = float(rep(comps.params, img, key, 8))  # same scan length as bench.py → cached compile

trace_dir = "/tmp/jaxtrace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    _ = float(rep(comps.params, img, key, 8))

xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("xplane files:", xplanes, flush=True)
if not xplanes:
    sys.exit("no xplane captured (tunnel may not support device tracing)")

from tensorboard_plugin_profile.convert import raw_to_tool_data  # noqa: E402

data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "framework_op_stats", {})
import gzip  # noqa: E402
import io  # noqa: E402

# framework_op_stats returns gzipped CSV bytes in some versions, str in others
if isinstance(data, bytes):
    try:
        data = gzip.decompress(data).decode()
    except OSError:
        data = data.decode()
out = "/tmp/op_stats.csv"
open(out, "w").write(data)
print(f"wrote {out} ({len(data)} bytes)")
lines = data.splitlines()
print(lines[0])
for l in lines[1:25]:
    print(l)
