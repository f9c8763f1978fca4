"""Cell instance proposers (the Cellpose replacement).

The reference's cell path runs Cellpose ``cyto2`` instance segmentation
(``model/conductor.py:156-180``) — CUDA/torch, no TPU port exists. Behind the
``InstanceProposer`` interface (SURVEY §7.9) two TPU-native implementations:

* ``DistanceWatershedProposer`` — classical, works without any weights:
  intensity threshold → distance transform → local-maxima markers →
  nearest-marker (geodesic-approximate) assignment. scipy.ndimage only.

* ``FlowNetProposer`` — a cellpose-style flow-field model: a DynUNet
  predicts (flow_y, flow_x, cell probability); pixels follow the flow field
  for a fixed number of Euler steps (a jitted ``lax.fori_loop`` — the
  sequential integration the reference runs in CUDA), and endpoints cluster
  into instances via connected components on the host. Ships with flow
  ground-truth generation (center-directed normalized displacement) so the
  net is trainable from instance masks.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from ldiffusion_tpu.models.dynunet import DynUNet, DynUNetConfig


class InstanceProposer(Protocol):
    def propose(self, image: np.ndarray) -> np.ndarray:
        """image: (H, W, 3) float in [0,1] → (H, W) int32 instance ids
        (0 = background)."""
        ...


# ---------------------------------------------------------------------------
# Classical proposer
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class DistanceWatershedProposer:
    """Threshold + distance-transform watershed approximation.

    Nearest-marker assignment via ``distance_transform_edt``'s return_indices
    restricted to the foreground mask — a Voronoi partition of the mask seeded
    at distance-transform maxima (marker-based watershed behavior for convex
    blobs, which nuclei approximately are)."""

    threshold: Optional[float] = None   # None: Otsu-style automatic
    min_distance: int = 5               # marker suppression radius
    min_size: int = 15                  # drop tiny instances

    def propose(self, image: np.ndarray) -> np.ndarray:
        gray = image.mean(axis=-1) if image.ndim == 3 else image
        thr = self.threshold if self.threshold is not None else _otsu(gray)
        # nuclei are dark on H&E-like stains; segment the darker phase if it
        # is the minority, else the brighter one
        fg = gray < thr
        if fg.mean() > 0.5:
            fg = ~fg
        fg = ndimage.binary_opening(fg, iterations=1)
        if not fg.any():
            return np.zeros(gray.shape, np.int32)
        dist = ndimage.distance_transform_edt(fg)
        # local maxima as markers
        footprint = np.ones((2 * self.min_distance + 1,) * 2)
        maxima = (dist == ndimage.maximum_filter(dist, footprint=footprint)) & (dist > 1)
        markers, n = ndimage.label(maxima)
        if n == 0:
            markers, n = ndimage.label(fg)
            return _filter_small(markers.astype(np.int32), self.min_size)
        # centroid per marker region → single seed point
        seeds = np.zeros_like(markers)
        for idx, (cy, cx) in enumerate(
                ndimage.center_of_mass(maxima, markers, range(1, n + 1)), start=1):
            seeds[int(round(cy)), int(round(cx))] = idx
        # nearest-seed assignment within the mask
        _, (iy, ix) = ndimage.distance_transform_edt(seeds == 0, return_indices=True)
        labels = seeds[iy, ix]
        labels[~fg] = 0
        return _filter_small(labels.astype(np.int32), self.min_size)


def _otsu(gray: np.ndarray) -> float:
    hist, edges = np.histogram(gray.reshape(-1), bins=128)
    centers = (edges[:-1] + edges[1:]) / 2
    total = hist.sum()
    w0 = np.cumsum(hist)
    w1 = total - w0
    m0 = np.cumsum(hist * centers) / np.maximum(w0, 1)
    m1 = (np.sum(hist * centers) - np.cumsum(hist * centers)) / np.maximum(w1, 1)
    between = w0 * w1 * (m0 - m1) ** 2
    return float(centers[int(np.argmax(between))])


def _filter_small(labels: np.ndarray, min_size: int) -> np.ndarray:
    ids, counts = np.unique(labels, return_counts=True)
    kill = ids[(counts < min_size) & (ids != 0)]
    if kill.size:
        labels[np.isin(labels, kill)] = 0
    # re-densify ids
    ids = np.unique(labels)
    remap = np.zeros(labels.max() + 1, np.int32)
    remap[ids] = np.arange(len(ids))
    return remap[labels]


# ---------------------------------------------------------------------------
# Flow-field proposer (cellpose-style, trainable)
# ---------------------------------------------------------------------------

def masks_to_flows(masks: np.ndarray) -> np.ndarray:
    """Instance masks → (H, W, 3): [flow_y, flow_x, cellprob] ground truth.
    Flows point toward each instance's median center (cellpose's training
    target, computed from masks — no external dependency)."""
    h, w = masks.shape
    flows = np.zeros((h, w, 3), np.float32)
    for i in np.unique(masks):
        if i == 0:
            continue
        ys, xs = np.nonzero(masks == i)
        cy, cx = np.median(ys), np.median(xs)
        dy, dx = cy - ys, cx - xs
        norm = np.sqrt(dy ** 2 + dx ** 2) + 1e-6
        flows[ys, xs, 0] = dy / norm
        flows[ys, xs, 1] = dx / norm
        flows[ys, xs, 2] = 1.0
    return flows


@partial(jax.jit, static_argnames=("n_iter", "method"))
def follow_flows(flows: jax.Array, cellprob: jax.Array, n_iter: int = 200,
                 prob_threshold: float = 0.5, method: str = "squaring"):
    """Integrate pixels along the flow field (the TPU analog of cellpose's
    sequential flow dynamics). flows: (H, W, 2) [dy, dx]; returns final
    (y, x) positions per pixel, (H, W, 2).

    ``method="squaring"`` (default): scaling-and-squaring. The flow field is
    STATIC, so the n-step Euler map composed with itself is exactly the
    2n-step map (the only approximation is bilinear regridding of the map,
    the same interpolation Euler itself uses on the field). k₀ explicit
    steps then d map compositions cover k₀·2^d ≥ n_iter steps in
    O(log n_iter) gather passes instead of O(n_iter) — each pass is a
    1M-pixel random gather, the dominant cost of the cell path's propose
    stage on the tunneled TPU (BASELINE.md r5). ``method="euler"`` keeps
    the literal step-by-step integration (the oracle;
    ``tests/test_cell.py`` pins the two to near-identical partitions)."""
    h, w = cellprob.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    pos0 = jnp.stack([yy, xx], axis=-1)

    def bilinear(field, y, x):
        """Vector-valued bilinear sample: ONE 8-byte pair gather per tap (4
        total) instead of per-channel ``map_coordinates`` (8 scalar gathers)
        — these gathers are the entire cost of the integration passes.
        Coordinates are always in-range here (both loop bodies clip), so
        edge clamping only guards the +1 taps."""
        y0f, x0f = jnp.floor(y), jnp.floor(x)
        wy, wx = (y - y0f)[..., None], (x - x0f)[..., None]
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        return (field[y0, x0] * (1 - wy) * (1 - wx)
                + field[y0, x1] * (1 - wy) * wx
                + field[y1, x0] * wy * (1 - wx)
                + field[y1, x1] * wy * wx)

    def euler_body(_, pos):
        f = bilinear(flows, pos[..., 0], pos[..., 1])
        pos = pos + f
        return jnp.stack([jnp.clip(pos[..., 0], 0, h - 1),
                          jnp.clip(pos[..., 1], 0, w - 1)], axis=-1)

    if method == "euler" or n_iter <= 8:
        pos = jax.lax.fori_loop(0, n_iter, euler_body, pos0)
    else:
        assert method == "squaring", method
        d = max(1, int(np.ceil(np.log2(n_iter / 8))))
        k0 = -(-n_iter // (1 << d))  # ceil: k0 * 2^d >= n_iter
        pos = jax.lax.fori_loop(0, k0, euler_body, pos0)

        def square_body(_, phi):
            # φ∘φ: resample the k-step map at its own endpoints (values are
            # clipped in euler_body; bilinear blends stay in bounds)
            return bilinear(phi, phi[..., 0], phi[..., 1])

        pos = jax.lax.fori_loop(0, d, square_body, pos)
    mask = cellprob > prob_threshold
    return jnp.where(mask[..., None], pos, pos0)


def cluster_endpoints(pos: np.ndarray, cellprob: np.ndarray,
                      prob_threshold: float = 0.5, min_size: int = 15) -> np.ndarray:
    """Round converged positions to pixels, mark sink cells, and label the
    fg pixels by the connected component of their sink."""
    h, w = cellprob.shape
    fg = cellprob > prob_threshold
    py = np.clip(np.round(pos[..., 0]).astype(np.int64), 0, h - 1)
    px = np.clip(np.round(pos[..., 1]).astype(np.int64), 0, w - 1)
    return cluster_endpoints_packed(py * w + px, fg, min_size)


def cluster_endpoints_packed(sink_flat: np.ndarray, fg: np.ndarray,
                             min_size: int = 15) -> np.ndarray:
    """``cluster_endpoints`` on pre-rounded flat sink indices (row-major
    ``py * W + px``) — the packed form ``FlowNetProposer._device_propose``
    downloads (int32 + bool instead of two f32 coordinate planes)."""
    h, w = fg.shape
    sink_flat = np.asarray(sink_flat, np.int64)
    sinks = np.zeros(h * w, bool)
    sinks[sink_flat[fg]] = True
    sinks = ndimage.binary_dilation(sinks.reshape(h, w), iterations=1)
    sink_labels, _ = ndimage.label(sinks)
    labels = np.zeros((h, w), np.int32)
    labels[fg] = sink_labels.ravel()[sink_flat[fg]]
    return _filter_small(labels, min_size)


@dataclasses.dataclass
class FlowNetProposer:
    """Trainable cellpose-style proposer: DynUNet → flows → integrate →
    cluster."""

    params: dict
    net: DynUNet
    n_iter: int = 200
    prob_threshold: float = 0.5
    min_size: int = 15

    @classmethod
    def create(cls, rng=None, features=(32, 64, 128, 256), **kw) -> "FlowNetProposer":
        cfg = DynUNetConfig(in_channels=3, num_classes=3,
                            features_per_stage=features,
                            strides=(1,) + (2,) * (len(features) - 1),
                            deep_supervision=False)
        net = DynUNet(cfg)
        rng = jax.random.key(0) if rng is None else rng
        params = net.init(rng, jnp.zeros((1, 64, 64, 3)))["params"]
        return cls(params=params, net=net, **kw)

    # -- persistence ---------------------------------------------------------
    def save(self, path: str) -> None:
        """npz of flattened params + the feature schedule (portable artifact,
        the cyto2-checkpoint analog)."""
        import os

        flat = {"/".join(p.key for p in k): np.asarray(v) for k, v in
                jax.tree_util.tree_flatten_with_path(self.params)[0]}
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(
            path, __features__=np.asarray(self.net.config.features_per_stage),
            **flat)

    @classmethod
    def load(cls, path: str, **kw) -> "FlowNetProposer":
        z = np.load(path)
        features = tuple(int(f) for f in z["__features__"])
        prop = cls.create(features=features, **kw)

        def rebuild(tree, prefix=()):
            if isinstance(tree, dict):
                return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
            return jnp.asarray(z["/".join(prefix)])

        prop.params = rebuild(prop.params)
        return prop

    @classmethod
    def load_pretrained(cls, domain: str = "synthetic", **kw) -> "FlowNetProposer":
        """A committed artifact (see ``tools/train_flownet_artifact.py`` /
        ``tools/train_flownet_transformed.py`` for provenance).

        * ``domain="synthetic"``: trained on raw synthetic blob/ellipse
          instances — a starting point / demo weight, not a pathology-domain
          model (the reference's cyto2 is likewise an out-of-domain
          generalist, ``model/conductor.py:156-180``).
        * ``domain="transformed"``: fine-tuned on one-step-DIFFUSION-
          transformed synthetic instances — the domain the cell path
          actually feeds the proposer (reference ``segmentor.py:252-257``
          caches transformed loaders)."""
        import os

        assert domain in ("synthetic", "transformed"), domain
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "artifacts", f"flownet_{domain}.npz")
        return cls.load(path, **kw)

    def _net_fn(self):
        """Jitted net forward (cached on the instance): an eager
        ``net.apply`` dispatches op-by-op — hundreds of ~0.5 s round trips
        over the tunneled TPU (BASELINE.md r5 cell-path bench)."""
        fn = getattr(self, "_jit_net", None)
        if fn is None:
            fn = jax.jit(lambda p, im: self.net.apply({"params": p}, im,
                                                      train=False))
            object.__setattr__(self, "_jit_net", fn)
        return fn

    def predict_flows(self, image: np.ndarray) -> np.ndarray:
        out = self._net_fn()(self.params, jnp.asarray(image)[None])[0]
        return np.asarray(out)

    def device_flows_and_pos(self, image) -> tuple:
        """Explicit (pos, cellprob) route — the oracle ``propose`` is pinned
        against (``tests/test_cell_fastpath.py``); the shipped ``propose``
        uses ``_device_propose``, which fuses the same computation plus the
        endpoint rounding into one dispatch with a packed download."""
        out = self._net_fn()(self.params, jnp.asarray(image)[None])[0]
        # net regresses 5x-scaled flows (cellpose convention); unscale here
        flows, cellprob = out[..., :2] / 5.0, jax.nn.sigmoid(out[..., 2])
        pos = follow_flows(flows, cellprob, self.n_iter, self.prob_threshold)
        return pos, cellprob

    def _device_propose(self, image) -> tuple:
        """ONE dispatch for the whole device side of ``propose``: net forward
        → sigmoid → flow integration → rounded flat sink index + fg mask.
        vs. the two-dispatch ``device_flows_and_pos`` + host rounding this
        saves a tunnel round trip and shrinks the download from 12 MB of f32
        coordinate/probability planes to 5 MB (int32 + bool) at 1024²."""
        fn = getattr(self, "_jit_propose", None)
        if fn is None:
            def run(p, im):
                out = self.net.apply({"params": p}, im[None], train=False)[0]
                flows = out[..., :2] / 5.0
                cellprob = jax.nn.sigmoid(out[..., 2])
                pos = follow_flows(flows, cellprob, self.n_iter,
                                   self.prob_threshold)
                h, w = cellprob.shape
                py = jnp.clip(jnp.round(pos[..., 0]), 0, h - 1).astype(jnp.int32)
                px = jnp.clip(jnp.round(pos[..., 1]), 0, w - 1).astype(jnp.int32)
                return py * w + px, cellprob > self.prob_threshold
            fn = jax.jit(run)
            object.__setattr__(self, "_jit_propose", fn)
        return fn(self.params, jnp.asarray(image))

    def propose(self, image: np.ndarray) -> np.ndarray:
        sink_flat, fg = self._device_propose(image)
        return cluster_endpoints_packed(np.asarray(sink_flat), np.asarray(fg),
                                        self.min_size)

    # -- training -----------------------------------------------------------
    def loss_fn(self, params, images, flow_targets):
        """images: (B,H,W,3); flow_targets: (B,H,W,3) from masks_to_flows.
        Cellpose objective: L2 on flows (×5) + BCE on cellprob."""
        out = self.net.apply({"params": params}, images, train=False)
        flow_l2 = jnp.mean((out[..., :2] - flow_targets[..., :2] * 5.0) ** 2)
        logits = out[..., 2]
        tgt = flow_targets[..., 2]
        bce = jnp.mean(optax_sigmoid_bce(logits, tgt))
        return flow_l2 + bce


def optax_sigmoid_bce(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


class FlowNetTrainer:
    """Train the flow-field proposer from instance masks (the path cellpose
    used offline to produce cyto2; here it is a first-class trainable).

    AdamW over the DynUNet; targets from :func:`masks_to_flows`."""

    def __init__(self, proposer: FlowNetProposer, lr: float = 1e-3):
        import optax

        self.proposer = proposer
        self.tx = optax.adamw(lr)
        self.opt_state = self.tx.init(proposer.params)
        self._step = self._make_step()

    def _make_step(self):
        import optax

        prop = self.proposer

        @jax.jit
        def step(params, opt_state, images, flow_targets):
            loss, grads = jax.value_and_grad(prop.loss_fn)(params, images, flow_targets)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def train(self, images, instance_masks, epochs: int = 10, batch_size: int = 4,
              seed: int = 0):
        """images: list of (H, W, 3) in [0,1]; instance_masks: list of (H, W)
        int instance ids. Returns per-epoch losses."""
        targets = [masks_to_flows(m) for m in instance_masks]
        x = jnp.asarray(np.stack(images), jnp.float32)
        y = jnp.asarray(np.stack(targets), jnp.float32)
        rng = np.random.default_rng(seed)
        losses = []
        n = x.shape[0]
        for _ in range(epochs):
            order = rng.permutation(n)
            total, steps = 0.0, 0
            for s in range(0, n, batch_size):
                idx = order[s:s + batch_size]
                self.proposer.params, self.opt_state, loss = self._step(
                    self.proposer.params, self.opt_state, x[idx], y[idx])
                total += float(loss)
                steps += 1
            losses.append(total / max(steps, 1))
        return losses
