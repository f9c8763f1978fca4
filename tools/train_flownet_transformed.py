"""Score and fine-tune the flow-net proposer in the TRANSFORMED domain.

VERDICT r3 item 6: the committed ``flownet_synthetic.npz`` artifact was
trained/evaluated on raw synthetic instances, but the cell path feeds the
proposer one-step-diffusion TRANSFORMED images (reference ``segmentor.py:
252-257`` caches transformed loaders; ``model/conductor.py:156-180`` runs
cyto2 on them). This tool

1. generates synthetic cell cases (same generator as the synthetic artifact),
2. pushes the images through ``one_step_transform`` (random SD weights — no
   checkpoint in this environment; the DOMAIN SHIFT is what matters),
3. scores watershed and the synthetic-domain artifact on the transformed
   test images,
4. trains the proposer on transformed training images (round 5: from-scratch
   96 cases / 180 epochs / features (32,64,128) — the winning configuration
   of ``tools/ablate_flownet_transformed.py``, which showed the r4 gap was
   data volume + flow-head capacity, not domain difficulty), and
5. saves ``ldiffusion_tpu/artifacts/flownet_transformed.npz`` iff it beats
   BOTH watershed and the unadapted synthetic artifact on PQ.

Numbers land in BASELINE.md (round 4 recipe; round 5 ablation + artifact).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/train_flownet_transformed.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from train_flownet_artifact import make_case  # noqa: E402


def transform_images(images, batch_size=4):
    """Raw [0,1] (H,W,3) images → one-step-transformed images (the exact
    domain the cell path's proposer sees)."""
    from ldiffusion_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
    from ldiffusion_tpu.diffusion.pipeline import SDComponents
    from ldiffusion_tpu.ops.quant import set_quant_mode
    from ldiffusion_tpu.segmentor.dataset_builder import DiffusionTransform

    set_quant_mode("none")
    comps = SDComponents.random(image_size=images[0].shape[0])
    tf = DiffusionTransform(comps, batch_size=batch_size)
    norm = np.stack([(im - IMAGENET_MEAN) / IMAGENET_STD for im in images])
    out = tf(norm.astype(np.float32))
    return [np.asarray(o) for o in out]


def main():
    from ldiffusion_tpu.cell.instance import (
        DistanceWatershedProposer,
        FlowNetProposer,
        FlowNetTrainer,
    )
    from ldiffusion_tpu.evaluate import evaluate_instances

    rng = np.random.default_rng(0)
    train = [make_case(rng) for _ in range(96)]
    test = [make_case(rng) for _ in range(8)]
    gts = [m for _, m in test]

    print("transforming images through the 1-step diffusion pipeline ...")
    tr_imgs = transform_images([im for im, _ in train])
    te_imgs = transform_images([im for im, _ in test])

    ws = DistanceWatershedProposer()
    ws_m = evaluate_instances([ws.propose(im) for im in te_imgs], gts)
    print(f"watershed (transformed):        PQ {ws_m['pq']:.3f} "
          f"AJI {ws_m['mean_aji']:.3f}")

    syn = FlowNetProposer.load_pretrained(n_iter=150)
    syn_m = evaluate_instances([syn.propose(im) for im in te_imgs], gts)
    print(f"synthetic artifact (unadapted): PQ {syn_m['pq']:.3f} "
          f"AJI {syn_m['mean_aji']:.3f}")

    # train from scratch in the transformed domain (r5 ablation winner;
    # warm-starting from the synthetic artifact caps PQ ~0.03 lower)
    prop = FlowNetProposer.create(features=(32, 64, 128), n_iter=150)
    trainer = FlowNetTrainer(prop, lr=1e-3)
    losses = trainer.train(tr_imgs, [m for _, m in train],
                           epochs=180, batch_size=4)
    print(f"train loss {losses[0]:.3f} -> {losses[-1]:.3f}")
    ft_m = evaluate_instances([prop.propose(im) for im in te_imgs], gts)
    print(f"trained (transformed):          PQ {ft_m['pq']:.3f} "
          f"AJI {ft_m['mean_aji']:.3f}")

    if ft_m["pq"] > max(ws_m["pq"], syn_m["pq"]):
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ldiffusion_tpu", "artifacts", "flownet_transformed.npz")
        prop.save(out)
        print(f"saved {out} ({os.path.getsize(out)/1e6:.1f} MB)")
    else:
        print("NOT saved: fine-tune did not beat both baselines")


if __name__ == "__main__":
    main()
