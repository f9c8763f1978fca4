"""Does int8 W8A8 actually beat bf16 on this chip's MXU for our conv shapes?

Microbench before wiring: representative convs from the pipeline profile
(VAE decoder 512²/256² heavy 3×3s, UNet 64² channel-heavy 3×3s, attention
QKV matmul). Times include the dynamic quantization overhead (activation
max+scale pass) — that is the real deployment cost.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from tpu_claim import claim_tpu  # noqa: E402

claim_tpu()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from ldiffusion_tpu.ops.quant import int8_conv, int8_matmul  # noqa: E402

B = 8
rng = np.random.default_rng(0)


def timed(name, f, *args, iters=32, flops=None):
    def repeat(a0, rest):
        def body(c, _):
            o = f(a0 + c.astype(a0.dtype), *rest)
            return jnp.mean(o.astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    jf = jax.jit(repeat)
    _ = float(jf(args[0], args[1:]))
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(jf(args[0], args[1:]))
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    extra = f"  {flops / dt / 1e12:.1f} TFLOP/s" if flops else ""
    print(f"{name}: {dt*1e3:.3f} ms{extra}", flush=True)
    return dt


def static_int8_conv(x, k, pad):
    """Ceiling probe: int8 conv with a FIXED activation scale — no max pass;
    the quantize is a pure elementwise that fuses into the producer."""
    sx = jnp.float32(0.05)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(k.astype(jnp.float32) / 0.002), -127, 127).astype(jnp.int8)
    out = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), list(pad), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * (sx * 0.002)).astype(jnp.bfloat16)


def conv_pair(tag, h, w, cin, cout, batch=B):
    x = jnp.asarray(rng.normal(size=(batch, h, w, cin)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.05)
    kb = k.astype(jnp.bfloat16)
    flops = 2 * batch * h * w * 9 * cin * cout
    pad = ((1, 1), (1, 1))

    def bf16(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), list(pad), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    t_b = timed(f"{tag} bf16", bf16, x, kb, flops=flops)
    t_q = timed(f"{tag} int8(W8A8 dyn)", lambda x, k: int8_conv(x, k, (1, 1), pad),
                x, k, flops=flops)
    t_s = timed(f"{tag} int8(static)", lambda x, k: static_int8_conv(x, k, pad),
                x, k, flops=flops)
    print(f"  -> int8 dyn {t_b / t_q:.2f}x  static {t_b / t_s:.2f}x", flush=True)


# VAE decoder hot shapes (512²/256²/128² at 128-512 ch)
conv_pair("dec 512x512 c128", 512, 512, 128, 128)
conv_pair("dec 256x256 c256", 256, 256, 256, 256)
conv_pair("dec 256x256 c512->256", 256, 256, 512, 256)
conv_pair("dec 128x128 c512", 128, 128, 512, 512)
conv_pair("dec 64x64 c512", 64, 64, 512, 512)
# UNet hot shapes (64² at 320, 32² at 640, 16² at 1280)
conv_pair("unet 64x64 c320", 64, 64, 320, 320)
conv_pair("unet 64x64 c960->320 (concat)", 64, 64, 960, 320)
conv_pair("unet 32x32 c640", 32, 32, 640, 640)
conv_pair("unet 32x32 c1280->640", 32, 32, 1280, 640)
conv_pair("unet 16x16 c1280", 16, 16, 1280, 1280)
conv_pair("enc 512x512 c3->128", 512, 512, 3, 128)

# attention-ish matmul (4096 x 512 x 512)
x = jnp.asarray(rng.normal(size=(B, 4096, 512)).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32) * 0.05)
flops = 2 * B * 4096 * 512 * 512
t_b = timed("matmul 4096x512x512 bf16",
            lambda x, w: jnp.einsum("bsk,kn->bsn", x, w.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            x, w, flops=flops)
t_q = timed("matmul 4096x512x512 int8", lambda x, w: int8_matmul(x, w), x, w,
            flops=flops)
print(f"  -> int8 speedup {t_b / t_q:.2f}x", flush=True)
