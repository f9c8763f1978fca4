"""Where does the 512² pipeline time go? enc vs unet-steps vs dec at batch 8."""
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

sys.path.insert(0, "/root/repo")
from bench import build  # noqa: E402
from ldiffusion_tpu.models.unet import UNet2DCondition, UNet2DConditionConfig  # noqa: E402

B = 8
comps, fn, rep = build(B)
params = comps.params
img = jnp.asarray(np.random.default_rng(0).normal(size=(B, 512, 512, 3)).astype(np.float32))


def timed(name, f, *args, iters=16):
    # one on-device scan dispatch; the carry feeds back into the input so
    # XLA cannot hoist the body out of the loop
    def repeat(p, x):
        def body(c, _):
            o = f(p, x + c.astype(x.dtype))
            return jnp.mean(o).astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    jf = jax.jit(repeat)
    # value-read sync: block_until_ready is a no-op over the tunnel
    _ = float(jf(*args))
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(jf(*args))
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    print(f"{name}: {dt*1000:.1f} ms/iter (batch {B}) = {dt/B*1000:.2f} ms/img",
          flush=True)
    return dt


enc = lambda p, x: comps.vae.apply({"params": p["vae"]}, x, method=comps.vae.encode_mean)
timed("vae encode 512", enc, params, img)
lat = jnp.asarray(np.random.default_rng(1).normal(size=(B, 64, 64, 4)).astype(np.float32))
dec = lambda p, z: comps.vae.apply({"params": p["vae"]}, z, method=comps.vae.decode_latents)
timed("vae decode 512", dec, params, lat)
ctx = jnp.zeros((B, 5, 768))
ufn = lambda p, l: comps.unet.apply({"params": p["unet"]}, l, jnp.int32(801), ctx)
timed("unet fwd 64lat", ufn, params, lat)

# A/B: params pre-cast to bf16 (kills per-step f32->bf16 cast traffic if XLA
# is not hoisting the casts out of the UNet scan)
params_bf16 = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)
timed("unet fwd 64lat bf16 params", ufn, params_bf16, lat)
timed("vae decode bf16 params", dec, params_bf16, lat)
timed("vae encode bf16 params", enc, params_bf16, img)
