"""Per-pixel trajectory-feature dump for analysis.

Behavioral contract: reference ``pixel_latent_vector.py:1-109`` — for each
image, run the Laplace trajectory across the inference steps, grayscale each
decode and dump per-pixel feature vectors (one channel per timestep) with
their labels to CSV for offline analysis.

The reference file is broken (imports a nonexistent ``CustomDataset``,
references an undefined ``train_loader`` — SURVEY §1 orphans); this is the
working version on the framework's pipeline.
"""
from __future__ import annotations

import argparse
import csv
import os
from typing import Optional

import jax
import numpy as np

from ldiffusion_tpu.data.dataset import SegmentationDataset, list_pairs
from ldiffusion_tpu.diffusion.pipeline import SDComponents, trajectory_features


def dump_pixel_latent_vectors(components: SDComponents, dataset: SegmentationDataset,
                              num_inference_steps: int, out_csv: str,
                              max_images: Optional[int] = None,
                              max_pixels_per_image: int = 4096, seed: int = 0):
    os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
    key = jax.random.key(seed)
    steps = max(1, int(num_inference_steps / 5))
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    with open(out_csv, "w", newline="") as f:
        writer = csv.writer(f)
        header_written = False
        for i in range(n):
            img, lab = dataset.get(i, image_size=64, label_size=64)
            key, sub = jax.random.split(key)
            traj, _ = trajectory_features(components, components.params,
                                          img[None].astype(np.float32), sub, steps)
            traj = np.asarray(traj[0])          # (64, 64, T)
            t_dim = traj.shape[-1]
            if not header_written:
                writer.writerow(["image", "y", "x", "label"] +
                                [f"step_{t}" for t in range(t_dim)])
                header_written = True
            flat = traj.reshape(-1, t_dim)
            labs = lab.reshape(-1)
            take = min(max_pixels_per_image, flat.shape[0])
            idx = np.random.default_rng(seed + i).choice(flat.shape[0], take,
                                                         replace=False)
            for j in idx:
                y, x = divmod(int(j), traj.shape[1])
                writer.writerow([i, y, x, int(labs[j])] +
                                [f"{v:.6f}" for v in flat[j]])
    return out_csv


def main(argv=None):
    p = argparse.ArgumentParser(description="Dump per-pixel diffusion trajectory "
                                            "features to CSV")
    p.add_argument("--diffusion-path", required=True)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--label-dir", required=True)
    p.add_argument("--level", default="tissue")
    p.add_argument("--num-inference-steps", type=int, default=25)
    p.add_argument("--out", default="pixel_latent_vectors.csv")
    p.add_argument("--max-images", type=int, default=None)
    args = p.parse_args(argv)
    comps = (SDComponents.random() if args.diffusion_path.startswith("random:")
             else SDComponents.load(args.diffusion_path))
    images, labels = list_pairs(args.image_dir, args.label_dir)
    ds = SegmentationDataset(images, labels, args.level)
    out = dump_pixel_latent_vectors(comps, ds, args.num_inference_steps, args.out,
                                    args.max_images)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
