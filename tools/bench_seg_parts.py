"""Break down the segmentor train-step cost: fwd / fwd+loss / fwd+bwd / update."""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from tpu_claim import claim_tpu  # noqa: E402

claim_tpu()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ldiffusion_tpu.losses.dice import robust_cross_entropy, soft_dice_loss  # noqa: E402
from ldiffusion_tpu.models.dynunet import DynUNet, DynUNetConfig  # noqa: E402

B, PH, PW = 2, 1024, 1024
cfg = DynUNetConfig(num_classes=7,
                    features_per_stage=(32, 64, 128, 256, 512, 512, 512),
                    strides=(1, 2, 2, 2, 2, 2, 2))
net = DynUNet(cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
data = jnp.asarray(rng.normal(size=(B, PH, PW, 3)).astype(np.float32))
seg = jnp.asarray(rng.integers(0, 7, size=(B, PH, PW)).astype(np.int32))
params = net.init(jax.random.key(0), jnp.zeros((1, PH, PW, 3)))["params"]
print("init done", flush=True)


def timed(name, f, *args, iters=4):
    def repeat(p, x, *rest):
        def body(c, _):
            o = f(p, x + c.astype(x.dtype), *rest)
            return jnp.asarray(o, jnp.float32).mean() * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    jf = jax.jit(repeat)
    t0 = time.time()
    _ = float(jf(*args))  # value read = real sync
    print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    _ = float(jf(*args))
    print(f"{name}: {(time.time()-t0)/iters*1000:.0f} ms/iter", flush=True)


def fwd_only(p, x):
    outs = net.apply({"params": p}, x, train=True)
    return sum(jnp.mean(o) for o in outs)


def fwd_loss(p, x, s):
    outs = net.apply({"params": p}, x, train=True)
    total = 0.0
    cur = s
    for o in outs:
        hh = o.shape[1]
        while cur.shape[1] > hh:
            cur = cur[:, ::2, ::2]
        total = total + soft_dice_loss(o, cur) + robust_cross_entropy(o, cur)
    return total


def fwd_bwd(p, x, s):
    g = jax.grad(lambda pp: fwd_loss(pp, x, s))(p)
    return sum(jnp.sum(jnp.abs(l).astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))


timed("fwd only", fwd_only, params, data)
timed("fwd+DS loss", fwd_loss, params, data, seg)
timed("fwd+bwd", fwd_bwd, params, data, seg)

# no-deep-supervision fwd for comparison
cfg2 = DynUNetConfig(num_classes=7, features_per_stage=cfg.features_per_stage,
                     strides=cfg.strides, deep_supervision=False)
net2 = DynUNet(cfg2, dtype=jnp.bfloat16)


def fwd2(p, x):
    return jnp.mean(net2.apply({"params": p}, x, train=False))


timed("fwd only (no DS heads)", fwd2, params, data)
