"""Adan optimizer (core/optim.py) — update-math parity against a
hand-stepped numpy oracle on a toy quadratic, convergence, and variant
wiring (reference variants/optimizer/nnUNetTrainerAdan.py).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from ldiffusion_tpu.core.optim import adan  # noqa: E402


def _numpy_adan_steps(theta0, grads, lr, betas=(0.02, 0.08, 0.01),
                      eps=1e-8, wd=0.0):
    """Literal transcription of Algorithm 1 (arXiv:2208.06677) with
    adan_pytorch's new-sample-weight betas + bias correction + decoupled
    decay — independent of the optax implementation."""
    b1, b2, b3 = betas
    m = np.zeros_like(theta0)
    v = np.zeros_like(theta0)
    n = np.zeros_like(theta0)
    prev = np.zeros_like(theta0)
    theta = theta0.copy()
    out = []
    for k, g in enumerate(grads, start=1):
        diff = np.zeros_like(g) if k == 1 else g - prev
        m = (1 - b1) * m + b1 * g
        v = (1 - b2) * v + b2 * diff
        n = (1 - b3) * n + b3 * (g + (1 - b2) * diff) ** 2
        c1 = 1 - (1 - b1) ** k
        c2 = 1 - (1 - b2) ** k
        c3 = 1 - (1 - b3) ** k
        u = (m / c1 + (1 - b2) * v / c2) / (np.sqrt(n / c3) + eps)
        theta = (theta - lr * u) / (1 + lr * wd)
        prev = g
        out.append(theta.copy())
    return out


@pytest.mark.parametrize("wd", [0.0, 3e-5, 1e-2])
def test_adan_matches_numpy_oracle(wd):
    """f(θ) = 0.5 θᵀ A θ - bᵀ θ; six steps, element-exact vs the oracle."""
    rng = np.random.default_rng(0)
    A = np.diag(rng.uniform(0.5, 3.0, size=5)).astype(np.float64)
    b = rng.normal(size=5).astype(np.float64)
    theta0 = rng.normal(size=5).astype(np.float64)
    lr = 1e-2

    tx = adan(lr, weight_decay=wd)
    theta = jnp.asarray(theta0)
    state = tx.init(theta)

    grads_seen = []
    jax_trace = []
    for _ in range(6):
        g = np.asarray(A @ np.asarray(theta, np.float64) - b)
        grads_seen.append(g)
        upd, state = tx.update(jnp.asarray(g), state, theta)
        theta = optax.apply_updates(theta, upd)
        jax_trace.append(np.asarray(theta, np.float64))

    oracle = _numpy_adan_steps(theta0, grads_seen, lr, wd=wd)
    for k, (got, want) in enumerate(zip(jax_trace, oracle), start=1):
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7,
                                   err_msg=f"step {k}")


def test_adan_first_step_direction_is_signlike():
    """With zero state, step 1 reduces to m̂/sqrt(n̂) = g/|g| (up to eps):
    the first update must be ~ -lr * sign(g)."""
    g = jnp.asarray([0.5, -2.0, 1e-3])
    tx = adan(0.1)
    p = jnp.zeros(3)
    state = tx.init(p)
    upd, _ = tx.update(g, state, p)
    np.testing.assert_allclose(np.asarray(upd), -0.1 * np.sign(g), rtol=1e-4)


def test_adan_converges_on_quadratic():
    A = jnp.asarray(np.diag([1.0, 10.0, 0.3]))
    b = jnp.asarray([1.0, -2.0, 0.5])
    opt_theta = np.linalg.solve(np.asarray(A), np.asarray(b))

    # step schedule (also exercises the callable learning_rate path): Adan's
    # near-optimum steps are ~sign-like (±lr), so a constant-then-small
    # schedule is needed to settle tightly
    tx = adan(lambda count: jnp.where(count < 500, 5e-2, 1e-3))
    theta = jnp.zeros(3)
    state = tx.init(theta)

    @jax.jit
    def step(theta, state):
        g = A @ theta - b
        upd, state = tx.update(g, state, theta)
        return optax.apply_updates(theta, upd), state

    for _ in range(900):
        theta, state = step(theta, state)
    np.testing.assert_allclose(np.asarray(theta), opt_theta, atol=3e-3)


def test_adan_variant_wiring():
    from ldiffusion_tpu.segmentor.variants import get_variant

    for name, lr in (("nnUNetTrainerAdan", 1e-2),
                     ("nnUNetTrainerAdan1en3", 1e-3),
                     ("nnUNetTrainerAdan3en4", 3e-4),
                     ("nnUNetTrainerAdan1en1", 1e-1),
                     ("nnUNetTrainerAdanCosAnneal", 1e-2)):
        v = get_variant(name)
        assert v.optimizer == "adan", name
        assert v.config.initial_lr == pytest.approx(lr), name
    assert get_variant("nnUNetTrainerAdanCosAnneal").lr_schedule == "cosine"
    # Adam names must NOT be hijacked
    assert get_variant("nnUNetTrainerAdam").optimizer == "adam"


def test_trainer_builds_adan_state(tmp_path):
    """SegmentorTrainer with an Adan variant must carry AdanState (three
    moments + prev_grad) in its optimizer state and train one epoch."""
    import dataclasses

    from ldiffusion_tpu.core.config import MeshConfig, SegmentorTrainConfig
    from ldiffusion_tpu.core.dist import make_mesh
    from ldiffusion_tpu.core.optim import AdanState
    from ldiffusion_tpu.segmentor.fingerprint import extract_fingerprint
    from ldiffusion_tpu.segmentor.planner import plan_experiment
    from ldiffusion_tpu.segmentor.preprocess import PreprocessedDataset
    from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer
    from ldiffusion_tpu.segmentor.variants import get_variant

    rng = np.random.default_rng(0)
    images = [rng.normal(size=(16, 16, 3)).astype(np.float32) + 1
              for _ in range(2)]
    labels = [np.repeat(np.arange(2, dtype=np.int32), 8)[:, None]
              * np.ones((1, 16), np.int32) for _ in range(2)]
    ds = PreprocessedDataset.build(images, labels, num_classes=2)
    plan = plan_experiment(extract_fingerprint(images, labels), num_classes=2)
    plan = dataclasses.replace(plan, patch_size=(16, 16), batch_size=4,
                               features_per_stage=(4, 8), strides=(1, 2))
    base = SegmentorTrainConfig(num_epochs=1, iters_per_epoch=1,
                                val_iters_per_epoch=1, compute_dtype="float32")
    variant = get_variant("nnUNetTrainerAdan1en3", base=base)
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=1),
                     devices=jax.devices()[:2])
    tr = SegmentorTrainer(plan, variant.config, mesh,
                          output_dir=str(tmp_path), variant=variant)
    leaves = jax.tree_util.tree_leaves(
        tr.state.opt_state, is_leaf=lambda x: isinstance(x, AdanState))
    assert any(isinstance(l, AdanState) for l in leaves)
    tr.run_training(ds, ds, num_epochs=1)
