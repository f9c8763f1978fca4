"""Staged TPU timing: VAE encode, UNet forward — isolates compile vs run cost."""
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

from ldiffusion_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402
from ldiffusion_tpu.ops import attention as att  # noqa: E402

mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
att.set_attention_mode(mode)
t00 = time.time()

vae = AutoencoderKL(VAEConfig.sd15(), dtype=jnp.bfloat16)
x = jnp.zeros((1, 512, 512, 3))
t0 = time.time()
params = vae.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
print("vae init", round(time.time() - t0, 1), flush=True)
enc = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode_mean))
t0 = time.time()
z = enc(params, x)
z.block_until_ready()
print("vae encode 512 compile+run", round(time.time() - t0, 1), flush=True)
t0 = time.time()
for _ in range(5):
    z = enc(params, x)
z.block_until_ready()
print("vae encode x5 secs", round(time.time() - t0, 2), flush=True)

from ldiffusion_tpu.models.unet import UNet2DCondition, UNet2DConditionConfig  # noqa: E402

unet = UNet2DCondition(UNet2DConditionConfig.sd15(), dtype=jnp.bfloat16)
lat = jnp.zeros((1, 64, 64, 4))
ctx = jnp.zeros((1, 5, 768))
t0 = time.time()
up = unet.init(jax.random.key(0), lat, jnp.int32(1), ctx)
print("unet init", round(time.time() - t0, 1), flush=True)
ufn = jax.jit(lambda p, l, t, c: unet.apply(p, l, t, c))
t0 = time.time()
o = ufn(up, lat, jnp.int32(801), ctx)
o.block_until_ready()
print("unet fwd compile+run", round(time.time() - t0, 1), flush=True)
t0 = time.time()
for _ in range(10):
    o = ufn(up, lat, jnp.int32(801), ctx)
o.block_until_ready()
print("unet fwd x10 secs", round(time.time() - t0, 2), flush=True)
print("total", round(time.time() - t00, 1), flush=True)
