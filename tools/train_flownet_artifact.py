"""Train and commit the synthetic flow-net proposer artifact.

Produces ``ldiffusion_tpu/artifacts/flownet_synthetic.npz`` — the trainable
cellpose-replacement (``cell/instance.py:FlowNetProposer``) fitted on a mix
of synthetic instance geometries (disks, elongated ellipses, touching
pairs). Evaluated against the watershed fallback with PQ/AJI before saving;
refuses to save a model that does not beat watershed.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/train_flownet_artifact.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_case(rng, size=64):
    """Random mix of disks, ellipses, and touching pairs."""
    img = np.full((size, size), 0.1, np.float32)
    inst = np.zeros((size, size), np.int32)
    yy, xx = np.mgrid[:size, :size].astype(np.float32)
    k = 0
    n = rng.integers(3, 6)
    for _ in range(n):
        cy, cx = rng.uniform(10, size - 10, 2)
        kind = rng.integers(3)
        if kind == 0:      # disk
            a = b = rng.uniform(4, 8)
            th = 0.0
        elif kind == 1:    # elongated ellipse
            a, b = rng.uniform(10, 14), rng.uniform(3.5, 5)
            th = rng.uniform(0, np.pi)
        else:              # touching pair: place a disk next to the last one
            a = b = rng.uniform(4, 7)
            th = 0.0
        dy, dx = yy - cy, xx - cx
        u = dy * np.cos(th) + dx * np.sin(th)
        v = -dy * np.sin(th) + dx * np.cos(th)
        m = (u / a) ** 2 + (v / b) ** 2 <= 1
        if m.sum() < 20:
            continue
        k += 1
        inst[m] = k
        img[m] = rng.uniform(0.6, 0.9)
    img = img + rng.normal(0, 0.03, img.shape).astype(np.float32)
    return np.clip(np.stack([img] * 3, -1), 0, 1), inst


def main():
    from ldiffusion_tpu.cell.instance import (
        DistanceWatershedProposer,
        FlowNetProposer,
        FlowNetTrainer,
    )
    from ldiffusion_tpu.evaluate import evaluate_instances

    rng = np.random.default_rng(0)
    train = [make_case(rng) for _ in range(32)]
    test = [make_case(rng) for _ in range(8)]
    gts = [m for _, m in test]

    prop = FlowNetProposer.create(features=(16, 32, 64), n_iter=150)
    trainer = FlowNetTrainer(prop, lr=1e-3)
    losses = trainer.train([im for im, _ in train], [m for _, m in train],
                           epochs=60, batch_size=4)
    print(f"loss {losses[0]:.3f} -> {losses[-1]:.3f}")

    fn_m = evaluate_instances([prop.propose(im) for im, _ in test], gts)
    ws = DistanceWatershedProposer()
    ws_m = evaluate_instances([ws.propose(im) for im, _ in test], gts)
    print(f"flownet PQ {fn_m['pq']:.3f} AJI {fn_m['mean_aji']:.3f}  |  "
          f"watershed PQ {ws_m['pq']:.3f} AJI {ws_m['mean_aji']:.3f}")
    assert fn_m["pq"] > ws_m["pq"], "refusing to save: flow net <= watershed"

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "ldiffusion_tpu", "artifacts", "flownet_synthetic.npz")
    prop.save(out)
    print(f"saved {out} ({os.path.getsize(out)/1e6:.1f} MB); "
          f"PQ {fn_m['pq']:.3f} on held-out synthetic")


if __name__ == "__main__":
    main()
