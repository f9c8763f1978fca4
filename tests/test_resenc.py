"""ResEnc planner variant: residual-encoder network (VERDICT r1 missing #6).

Reference: ``experiment_planning/experiment_planners/resencUNet_planner.py``
(nnUNetPlannerResEnc*) — same planning rules, ResidualEncoderUNet topology.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ldiffusion_tpu.models.dynunet import RESENC_M_BLOCKS, DynUNet, DynUNetConfig
from ldiffusion_tpu.segmentor.planner import SegPlan, plan_experiment


def _fingerprint(n=4, shape=(128, 128)):
    return {
        "shapes_after_crop": [list(shape)] * n,
        "num_channels": 3,
        "foreground_intensity_properties_per_channel": {},
    }


def test_resenc_plan_topology():
    plan = plan_experiment(_fingerprint(), num_classes=4, planner="resenc")
    assert plan.block_type == "residual"
    n = len(plan.features_per_stage)
    assert plan.n_blocks_per_stage == tuple(RESENC_M_BLOCKS[:n])
    # json round-trip keeps the residual config
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "plans.json")
        plan.save(p)
        loaded = SegPlan.load(p)
        assert loaded == plan
        assert loaded.network_config().block_type == "residual"


def test_resenc_network_forward_and_grad():
    cfg = DynUNetConfig(in_channels=3, num_classes=4,
                        features_per_stage=(8, 16, 32), strides=(1, 2, 2),
                        block_type="residual", n_blocks_per_stage=(1, 2, 2),
                        deep_supervision=True)
    net = DynUNet(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    params = net.init(jax.random.key(0), x)["params"]
    # encoder stage 1 has 2 residual blocks with the BasicBlockD param set
    assert "enc_1_1" in params and "conv2" in params["enc_1_1"]
    assert "downsample_conv" in params["enc_1_0"]  # stride-2 skip projection
    outs = net.apply({"params": params}, x, train=True)
    assert [o.shape for o in outs] == [(2, 32, 32, 4), (2, 16, 16, 4)]

    def loss(p):
        return sum(jnp.sum(o ** 2) for o in net.apply({"params": p}, x, train=True))

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)


def test_plain_default_unchanged():
    cfg = DynUNetConfig.tiny()
    assert cfg.block_type == "plain"
    net = DynUNet(dataclasses.replace(cfg, deep_supervision=False))
    x = jnp.zeros((1, 16, 16, 3))
    params = net.init(jax.random.key(0), x)["params"]
    assert "enc_0_0" in params and "conv" in params["enc_0_0"]
    out = net.apply({"params": params}, x, train=False)
    assert out.shape == (1, 16, 16, 7)
