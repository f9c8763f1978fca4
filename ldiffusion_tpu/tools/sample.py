"""Per-step sampling demo: save the decoded image at every reverse step.

Behavioral contract: reference ``sample.py:1-68`` (a dev demo with hardcoded
empty paths in the reference; parameterized here): load a (fine-tuned) UNet,
run the PNDM reverse loop from a VAE-encoded input with Laplace noising, and
save each step's decode as a PNG.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ldiffusion_tpu.data.dataset import load_image
from ldiffusion_tpu.diffusion.pipeline import SDComponents, trajectory_text_emb


def sample_steps(components: SDComponents, image: np.ndarray, num_steps: int,
                 out_dir: str, seed: int = 0, laplace: bool = True):
    os.makedirs(out_dir, exist_ok=True)
    sch = components.scheduler
    ts = sch.set_timesteps(num_steps)
    params = components.params
    emb = trajectory_text_emb(components, params, 1)
    latents = components.vae.apply({"params": params["vae"]},
                                   jnp.asarray(image)[None],
                                   method=components.vae.encode_mean)
    state = sch.init_state(latents.shape, latents.dtype)
    key = jax.random.key(seed)
    paths = []
    for i, t in enumerate(ts.values):
        tt = jnp.int32(t)
        x = latents
        if laplace:
            key, sub = jax.random.split(key)
            x = sch.add_laplace_noise(sub, x, tt)
        eps = components.unet.apply({"params": params["unet"]}, x, tt, emb)
        latents, state = sch.step(ts, state, eps, tt, latents)
        decoded = components.vae.apply({"params": params["vae"]}, latents,
                                       method=components.vae.decode_latents)
        arr = (np.clip(np.asarray(decoded[0]), 0, 1) * 255).astype(np.uint8)
        path = os.path.join(out_dir, f"step_{i:02d}_t{t}.png")
        Image.fromarray(arr).save(path)
        paths.append(path)
    return paths


def main(argv=None):
    p = argparse.ArgumentParser(description="Save per-step reverse-diffusion decodes")
    p.add_argument("--diffusion-path", required=True)
    p.add_argument("--ldiffusion-weight", default=None)
    p.add_argument("--image", required=True)
    p.add_argument("--num-steps", type=int, default=5)
    p.add_argument("--out-dir", default="sample_out")
    args = p.parse_args(argv)
    comps = (SDComponents.random() if args.diffusion_path.startswith("random:")
             else SDComponents.load(args.diffusion_path,
                                    unet_override_dir=args.ldiffusion_weight))
    size = 64 if args.diffusion_path.startswith("random:") else 512
    img = load_image(args.image, (size, size))
    paths = sample_steps(comps, img, args.num_steps, args.out_dir)
    print("\n".join(paths))


if __name__ == "__main__":
    main()
