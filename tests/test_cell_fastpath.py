"""The cell path's O(H·W) host fast paths match the naive per-instance
semantics exactly (reference ``model/conductor.py:175-233`` loops over
instances with full-image masks; at PUMA densities that is O(N·H·W) and
dominated the cell-inference wall — BASELINE.md r5)."""
import jax
import numpy as np
import pytest

from ldiffusion_tpu.cell.classifier import (
    MIN_BOX,
    PATCH,
    CellSegClassifier,
    CellTrainer,
    extract_instance_boxes,
    extract_instance_patches,
    roi_resize_64,
    _resize64,
)
from ldiffusion_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
from ldiffusion_tpu.models.resnet import ResNetConfig


def _random_instances(rng, h=96, w=96, n=12, non_dense=True):
    """Blob instance map with some boxes below MIN_BOX and a gap in the ids."""
    inst = np.zeros((h, w), np.int32)
    next_id = 1
    for k in range(n):
        cy, cx = rng.integers(5, h - 5), rng.integers(5, w - 5)
        r = int(rng.integers(1, 9))  # some below MIN_BOX
        yy, xx = np.ogrid[:h, :w]
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        inst[mask & (inst == 0)] = next_id
        next_id += 1
        if non_dense and k == 4:
            next_id += 3  # id gap: non-dense labeling
    return inst


def _naive_extract(image, instances, max_instances=None):
    """The pre-r5 implementation, kept as the oracle."""
    ids = [i for i in np.unique(instances) if i != 0]
    patches, keep, boxes = [], [], []
    for i in ids:
        ys, xs = np.nonzero(instances == i)
        y1, y2, x1, x2 = ys.min(), ys.max(), xs.min(), xs.max()
        if y2 - y1 < MIN_BOX or x2 - x1 < MIN_BOX:
            continue
        p = _resize64(image[y1:y2 + 1, x1:x2 + 1])
        patches.append((p - IMAGENET_MEAN) / IMAGENET_STD)
        keep.append(int(i))
        boxes.append((int(x1), int(y1), int(x2), int(y2)))
        if max_instances and len(keep) >= max_instances:
            break
    if not patches:
        return np.zeros((0, PATCH, PATCH, 3), np.float32), [], []
    return np.stack(patches), keep, boxes


@pytest.mark.parametrize("max_instances", [None, 3])
def test_extract_matches_naive(max_instances):
    rng = np.random.default_rng(0)
    image = rng.random((96, 96, 3)).astype(np.float32)
    inst = _random_instances(rng)
    fast = extract_instance_patches(image, inst, max_instances)
    ref = _naive_extract(image, inst, max_instances)
    assert fast[1] == ref[1] and fast[2] == ref[2]
    np.testing.assert_array_equal(fast[0], ref[0])


def test_extract_empty():
    image = np.zeros((32, 32, 3), np.float32)
    p, ids, boxes = extract_instance_patches(image, np.zeros((32, 32), np.int32))
    assert p.shape == (0, PATCH, PATCH, 3) and ids == [] and boxes == []


def _tiny_model(num_classes=4):
    cfg = ResNetConfig(stage_sizes=(1, 1), width=8)
    return CellSegClassifier(num_classes, encoder_cfg=cfg, rng=jax.random.key(1))


class _FixedProposer:
    def __init__(self, inst):
        self.inst = inst

    def propose(self, image):
        return self.inst


def test_forward_paint_and_predict_mask_match_naive():
    rng = np.random.default_rng(1)
    image = rng.random((96, 96, 3)).astype(np.float32)
    inst = _random_instances(rng)
    model = _tiny_model()
    model.proposer = _FixedProposer(inst)

    out = model.forward(image)["out"]
    # naive paint with the same classes (forward classifies via the device
    # ROI path, so source the reference classes from it too)
    ids, boxes = extract_instance_boxes(inst)
    classes = model.classify_rois(image, boxes)
    ref = np.zeros_like(out)
    for inst_id, cls in zip(ids, classes):
        ref[0, inst == inst_id, int(cls)] = 1.0
    np.testing.assert_array_equal(out, ref)

    # predict_mask's LUT shortcut equals argmax over the painted one-hot
    np.testing.assert_array_equal(
        model.predict_mask(image),
        np.argmax(out[0], axis=-1).astype(np.uint8))


def test_classify_patches_bucketing_invariant():
    """Zero-pad rows must not change the real rows' classes, and distinct N
    within a bucket reuse one compiled program."""
    model = _tiny_model()
    rng = np.random.default_rng(2)
    patches = rng.standard_normal((5, PATCH, PATCH, 3)).astype(np.float32)
    got5 = model.classify_patches(patches)
    got3 = model.classify_patches(patches[:3])
    np.testing.assert_array_equal(got5[:3], got3)
    assert got5.shape == (5,) and got5.min() >= 1
    assert got5.max() <= model.num_classes - 1


def test_roi_resize_matches_pil_on_upscale():
    """Device crop-and-resize equals the host PIL path on upscaled boxes
    (sides < 64, the cell regime): PIL bilinear applies no antialias filter
    there and uses the same center-alignment convention, so the only
    remaining difference is PIL's uint8 quantization (≤ ~1/255 per tap)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    image = rng.random((128, 128, 3)).astype(np.float32)
    boxes = []
    for _ in range(16):
        y1 = int(rng.integers(0, 60))
        x1 = int(rng.integers(0, 60))
        h = int(rng.integers(MIN_BOX + 1, 60))
        w = int(rng.integers(MIN_BOX + 1, 60))
        boxes.append((x1, y1, min(x1 + w, 127), min(y1 + h, 127)))
    dev = np.asarray(roi_resize_64(jnp.asarray(image),
                                   jnp.asarray(np.asarray(boxes, np.float32))))
    for k, (x1, y1, x2, y2) in enumerate(boxes):
        host = _resize64(image[y1:y2 + 1, x1:x2 + 1])
        assert np.max(np.abs(dev[k] - host)) <= 2.5 / 255, (
            k, np.max(np.abs(dev[k] - host)))


def test_classify_rois_matches_patches():
    """The fused image+boxes program predicts the same classes as the
    host-extracted patch path (fixed seed; differences are bounded by PIL's
    uint8 rounding + the patch path's f16 transfer, both far below typical
    decision margins)."""
    rng = np.random.default_rng(12)
    image = rng.random((96, 96, 3)).astype(np.float32)
    inst = _random_instances(rng)
    model = _tiny_model()
    ids, boxes = extract_instance_boxes(inst)
    patches, ids_p, _ = extract_instance_patches(image, inst)
    assert ids == ids_p
    via_patches = model.classify_patches(patches)
    via_rois = model.classify_rois(image, boxes)
    assert via_rois.shape == via_patches.shape
    agree = float(np.mean(via_rois == via_patches))
    assert agree >= 0.9, (agree, via_rois, via_patches)


def test_classify_rois_bucketing_invariant():
    """Dummy pad boxes must not change the real rows' classes."""
    rng = np.random.default_rng(13)
    image = rng.random((96, 96, 3)).astype(np.float32)
    inst = _random_instances(rng)
    model = _tiny_model()
    _, boxes = extract_instance_boxes(inst)
    assert len(boxes) >= 4
    all_cls = model.classify_rois(image, boxes)
    sub_cls = model.classify_rois(image, boxes[:3])
    np.testing.assert_array_equal(all_cls[:3], sub_cls)
    assert all_cls.min() >= 1 and all_cls.max() <= model.num_classes - 1


def test_follow_flows_squaring_matches_euler():
    """Scaling-and-squaring integration (log-depth map composition) yields
    the same instance partition as literal Euler stepping: the flow field is
    static, so composing the k-step map IS the 2k-step map up to bilinear
    regridding — the same interpolation Euler applies to the field."""
    from ldiffusion_tpu.cell.instance import (
        cluster_endpoints,
        follow_flows,
        masks_to_flows,
    )
    from ldiffusion_tpu.evaluate import evaluate_instances

    rng = np.random.default_rng(7)
    inst = _random_instances(rng, h=96, w=96, n=10)
    f = masks_to_flows(inst)
    flows, prob = f[..., :2], f[..., 2]
    labs = {}
    for method in ("euler", "squaring"):
        pos = follow_flows(flows, prob, n_iter=150, method=method)
        labs[method] = cluster_endpoints(np.asarray(pos), prob, min_size=10)
    m = evaluate_instances([labs["squaring"]], [labs["euler"]])
    assert m["pq"] > 0.9, m
    # both reconstruct the ground-truth instances they were derived from
    gt_m = evaluate_instances([labs["squaring"]], [inst])
    assert gt_m["pq"] > 0.8, gt_m


def test_fused_propose_matches_two_dispatch_route():
    """``FlowNetProposer.propose`` (single fused dispatch + packed int32/bool
    download) partitions identically to the explicit
    ``device_flows_and_pos`` → host-rounding → ``cluster_endpoints`` route,
    and ``cluster_endpoints_packed`` is exactly ``cluster_endpoints`` on
    pre-rounded indices."""
    from ldiffusion_tpu.cell.instance import (
        FlowNetProposer,
        cluster_endpoints,
        cluster_endpoints_packed,
    )

    rng = np.random.default_rng(11)
    image = rng.random((64, 64, 3)).astype(np.float32)
    prop = FlowNetProposer.create(features=(8, 16), n_iter=40, min_size=5)

    pos, cellprob = prop.device_flows_and_pos(image)
    pos, cellprob = np.asarray(pos), np.asarray(cellprob)
    ref = cluster_endpoints(pos, cellprob, prop.prob_threshold, prop.min_size)

    # pure host-side refactor: packed form == coordinate form, bit for bit
    h, w = cellprob.shape
    fg = cellprob > prop.prob_threshold
    py = np.clip(np.round(pos[..., 0]).astype(np.int64), 0, h - 1)
    px = np.clip(np.round(pos[..., 1]).astype(np.int64), 0, w - 1)
    np.testing.assert_array_equal(
        cluster_endpoints_packed(py * w + px, fg, prop.min_size), ref)

    # fused device program (net fwd + integration + rounding in ONE jit)
    np.testing.assert_array_equal(prop.propose(image), ref)


def test_instance_majority_labels_matches_naive():
    rng = np.random.default_rng(3)
    inst = _random_instances(rng)
    gt = rng.integers(0, 5, inst.shape).astype(np.int64)
    ids = [int(i) for i in np.unique(inst) if i != 0]
    got = CellTrainer.instance_majority_labels(inst, gt, ids)
    ref = np.array(
        [np.bincount(gt[inst == i].reshape(-1)).argmax() for i in ids], np.int32)
    np.testing.assert_array_equal(got, ref)
