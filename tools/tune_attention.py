"""Sweep flash-attention block sizes for the SD UNet's hot shape
(batch*heads=64, seq 4096, head dim 128-padded)."""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from tpu_claim import claim_tpu  # noqa: E402

claim_tpu()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from ldiffusion_tpu.ops.attention import _flash_attention_bhsd, _xla_attention  # noqa: E402

BH, S, D = 64, 4096, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(BH, S, D)).astype(np.float32), jnp.bfloat16)
scale = 1.0 / np.sqrt(40)  # real head dim


def timed(f, iters=16):
    def repeat(q, k, v):
        def body(c, _):
            o = f(q + c.astype(q.dtype), k, v)
            return jnp.mean(o).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    jf = jax.jit(repeat)
    _ = float(jf(q, k, v))
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(jf(q, k, v))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


# correctness vs xla on a slice first
ref = _xla_attention(q[:2, :, None, :].transpose(0, 1, 2, 3).reshape(2, S, 1, D),
                     k[:2].reshape(2, S, 1, D), v[:2].reshape(2, S, 1, D), scale)
got = _flash_attention_bhsd(q[:2], k[:2], v[:2], scale)
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                            ref.reshape(2, S, D).astype(jnp.float32))))
print("flash vs xla max err:", err, flush=True)

for bq, bk in [(256, 512), (512, 512), (512, 1024), (1024, 1024), (256, 1024),
               (1024, 2048), (512, 2048), (2048, 1024), (1024, 4096), (512, 4096),
               (2048, 2048), (4096, 1024)]:
    try:
        ms = timed(lambda q, k, v: _flash_attention_bhsd(q, k, v, scale,
                                                         block_q=bq, block_k=bk))
        print(f"block_q={bq} block_k={bk}: {ms:.2f} ms", flush=True)
    except Exception as e:
        print(f"block_q={bq} block_k={bk}: FAILED {type(e).__name__}", flush=True)
