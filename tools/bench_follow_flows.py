"""A/B gather strategies for the flow-integration map passes on the TPU.

The cell path's propose stage is dominated by ``follow_flows``'s bilinear
map-composition passes (BASELINE.md r5: 1.61 s at 1024² for ~13 passes under
scaling-and-squaring — ~124 ms per 1M-point pair gather). Each pass is 4
bilinear taps into an (H, W, 2) f32 field at computed coordinates; this probe
times the candidate lowerings of that tap:

  pair2d   — advanced indexing ``field[y0, x0]`` (2 index vectors; shipped)
  pairflat — flat row-major index into ``field.reshape(H*W, 2)`` (1 index vector)
  take     — ``jnp.take(flat_field, idx, axis=0)``
  onegather— all 4 taps batched into ONE gather of (H, W, 4, 2), then blended

Usage: python tools/bench_follow_flows.py  (claims the chip via tpu_claim)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tpu_claim import claim_tpu

    try:
        claim_tpu(max_wait=int(os.environ.get("BENCH_CLAIM_WAIT", "1200")))
    except Exception as e:
        print(f"claim_tpu: {e}; proceeding on default backend", file=sys.stderr)

    import jax
    import jax.numpy as jnp
    import numpy as np

    H = W = int(os.environ.get("FF_SIZE", "1024"))
    PASSES = int(os.environ.get("FF_PASSES", "13"))
    rng = np.random.default_rng(0)
    field_np = rng.normal(size=(H, W, 2)).astype(np.float32)
    # a plausible position map: identity + noise, clipped in-range
    pos_np = np.stack(np.meshgrid(np.arange(H, dtype=np.float32),
                                  np.arange(W, dtype=np.float32),
                                  indexing="ij"), -1)
    pos_np = np.clip(pos_np + rng.normal(scale=3.0, size=pos_np.shape)
                     .astype(np.float32), 0, H - 1)

    def taps(y, x):
        y0f, x0f = jnp.floor(y), jnp.floor(x)
        wy, wx = (y - y0f)[..., None], (x - x0f)[..., None]
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        return y0, x0, y1, x1, wy, wx

    def bil_pair2d(field, y, x):
        y0, x0, y1, x1, wy, wx = taps(y, x)
        return (field[y0, x0] * (1 - wy) * (1 - wx)
                + field[y0, x1] * (1 - wy) * wx
                + field[y1, x0] * wy * (1 - wx)
                + field[y1, x1] * wy * wx)

    def bil_pairflat(field, y, x):
        y0, x0, y1, x1, wy, wx = taps(y, x)
        f = field.reshape(H * W, 2)
        return (f[y0 * W + x0] * (1 - wy) * (1 - wx)
                + f[y0 * W + x1] * (1 - wy) * wx
                + f[y1 * W + x0] * wy * (1 - wx)
                + f[y1 * W + x1] * wy * wx)

    def bil_take(field, y, x):
        y0, x0, y1, x1, wy, wx = taps(y, x)
        f = field.reshape(H * W, 2)
        return (jnp.take(f, y0 * W + x0, axis=0) * (1 - wy) * (1 - wx)
                + jnp.take(f, y0 * W + x1, axis=0) * (1 - wy) * wx
                + jnp.take(f, y1 * W + x0, axis=0) * wy * (1 - wx)
                + jnp.take(f, y1 * W + x1, axis=0) * wy * wx)

    def bil_onegather(field, y, x):
        y0, x0, y1, x1, wy, wx = taps(y, x)
        f = field.reshape(H * W, 2)
        idx = jnp.stack([y0 * W + x0, y0 * W + x1,
                         y1 * W + x0, y1 * W + x1], axis=-1)  # (H, W, 4)
        g = jnp.take(f, idx, axis=0)                           # (H, W, 4, 2)
        w4 = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                        wy * (1 - wx), wy * wx], axis=-2)      # (H, W, 4, 1)
        return (g * w4).sum(axis=-2)

    impls = {"pair2d": bil_pair2d, "pairflat": bil_pairflat,
             "take": bil_take, "onegather": bil_onegather}

    def make_bench(bil):
        def run(field, pos):
            # PASSES map compositions, carry fed back (hoist-proof)
            def body(_, p):
                q = bil(p, p[..., 0], p[..., 1])
                return jnp.clip(q, 0, H - 1)
            return jax.lax.fori_loop(0, PASSES, body, pos)
        return jax.jit(run)

    field = jnp.asarray(field_np)
    pos = jnp.asarray(pos_np)
    ref = None
    for name, bil in impls.items():
        fn = make_bench(bil)
        t0 = time.perf_counter()
        out = np.asarray(fn(field, pos))  # value read = sync
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = np.asarray(fn(field, pos))
            times.append(time.perf_counter() - t0)
        if ref is None:
            ref = out
        err = float(np.abs(out - ref).max())
        best = min(times)
        print(f"{name:10s} compile {compile_s:6.1f}s  best {best*1e3:8.1f} ms "
              f"({best/PASSES*1e3:6.1f} ms/pass)  max|Δ| vs pair2d {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
