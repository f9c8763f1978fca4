"""A/B: flash-attention softmax via exp vs exp2 (VERDICT r3 item 8).

The flash kernel is VPU/exp-bound (131 ms/iter at the SD shapes, flat across
head dims — BASELINE.md r2/r3). If Mosaic lowers ``exp`` as
``exp2(x * log2 e)``, folding log2(e) into the attention scale saves one VPU
multiply per score element: p = exp2(s2 - m2) with s2 = (q·k) * (scale·log2e)
is EXACT (the base change cancels in softmax normalization).

Times the inference forward kernel at the benchmark's hot shapes. Run on the
TPU: python tools/bench_attn_exp2.py
"""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = math.log2(math.e)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, exp2):
    q = q_ref[0]
    bq, d = q.shape
    n_kv = k_ref.shape[1] // block_k
    # exp2 variant: fold log2(e) into the scale; track m/l in base-2 domain
    eff_scale = scale * LOG2E if exp2 else scale
    e = jnp.exp2 if exp2 else jnp.exp

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * eff_scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = e(s - m_new)
        corr = e(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "exp2"))
def flash(q, k, v, scale, block_q=512, block_k=1024, exp2=False):
    bh, sq, d = q.shape
    sk = k.shape[1]
    grid = (bh, sq // block_q)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, block_k=block_k, exp2=exp2),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "exp2", "iters"))
def loop(q, k, v, scale, block_q, block_k, exp2, iters):
    def body(c, _):
        o = flash(q + c, k, v, scale, block_q=block_q, block_k=block_k, exp2=exp2)
        return jnp.mean(o).astype(jnp.float32), None

    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
    return c


def main():
    from tpu_claim import claim_tpu

    try:
        claim_tpu(max_wait=600)
    except Exception as e:
        print(f"claim_tpu: {e}", file=sys.stderr)
    shapes = [
        # (BH, S, D): SD UNet spatial self-attn at 512² input, batch 8
        (64, 4096, 40),    # 64x64 latent, 8 heads x batch 8, d 40
        (64, 1024, 80),    # 32x32 stage
        (64, 256, 160),    # 16x16 stage
    ]
    key = jax.random.key(0)
    for bh, s, d in shapes:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (bh, s, d), jnp.bfloat16)
        k = jax.random.normal(kk, (bh, s, d), jnp.bfloat16)
        v = jax.random.normal(kv, (bh, s, d), jnp.bfloat16)
        scale = 1.0 / math.sqrt(d)
        bq = 512 if s % 512 == 0 else 256
        bk = s if (s <= 4096 and d <= 64 and s % 512 == 0) else (1024 if s % 1024 == 0 else 512)
        iters = 50
        # numeric parity first
        o1 = flash(q, k, v, scale, block_q=bq, block_k=bk, exp2=False)
        o2 = flash(q, k, v, scale, block_q=bq, block_k=bk, exp2=True)
        err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
        times = {}
        for exp2 in (False, True):
            _ = float(loop(q, k, v, scale, bq, bk, exp2, iters))  # compile
            best = float("inf")
            for _i in range(3):
                t0 = time.perf_counter()
                _ = float(loop(q, k, v, scale, bq, bk, exp2, iters))
                best = min(best, time.perf_counter() - t0)
            times[exp2] = best / iters * 1e3
        print(f"BH={bh} S={s} D={d}: exp {times[False]:.3f} ms  "
              f"exp2 {times[True]:.3f} ms  "
              f"speedup {times[False]/times[True]:.3f}x  maxerr {err:.2e}")


if __name__ == "__main__":
    main()
