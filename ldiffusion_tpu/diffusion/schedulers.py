"""Pure-functional diffusion schedulers (PNDM / DDIM / LMS).

The reference drives everything through the diffusers scheduler attached to
the SD pipeline — ``set_timesteps`` / ``scale_model_input`` / ``step``
(``ldiffusion.py:229-233``, ``segmentor.py:100-104``). SD v1.5 ships PNDM
(skip_prk_steps=True ⇒ PLMS), which is what the 1-step feature transform and
the warm-up trajectory loop use; LMS and DDIM are provided for parity with
the imports in ``model/loss.py:5`` and as inference options.

Design: scheduler *state* (PLMS ets ring buffer, counter, LMS derivative
history) is an explicit pytree so a whole sampling loop is one ``lax.scan``
under jit — no Python-side statefulness, fully shardable.

Timestep tables are static numpy computed at ``set_timesteps`` time; the
per-step math indexes jnp copies with the traced loop index.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldiffusion_tpu.diffusion.schedule import NoiseSchedule, sd15_schedule


@dataclasses.dataclass(frozen=True)
class Timesteps:
    """Static per-``set_timesteps`` data. ``values`` are the training-step
    indices visited, in sampling order (descending)."""

    values: Tuple[int, ...]
    num_inference_steps: int
    step_ratio: int

    def __len__(self) -> int:
        return len(self.values)

    @property
    def array(self) -> np.ndarray:
        return np.asarray(self.values, dtype=np.int32)


class PNDMState(NamedTuple):
    ets: jax.Array        # (4, *latent) ring of model outputs, newest last
    counter: jax.Array    # () int32
    cur_sample: jax.Array  # (*latent,) stashed sample for the counter==1 fixup


class LMSState(NamedTuple):
    derivatives: jax.Array  # (order, *latent), newest last
    counter: jax.Array


class DDIMState(NamedTuple):
    counter: jax.Array


class _SchedulerBase:
    order = 1

    def __init__(self, schedule: Optional[NoiseSchedule] = None):
        self.schedule = schedule or sd15_schedule()
        self._acp = jnp.asarray(self.schedule.alphas_cumprod)
        self._final_acp = jnp.float32(self.schedule.final_alpha_cumprod)

    # -- shared helpers -----------------------------------------------------
    def _alpha(self, t):
        """alpha_bar at (possibly negative) timestep; negative -> final."""
        t = jnp.asarray(t)
        safe = jnp.clip(t, 0, self.schedule.num_train_timesteps - 1)
        return jnp.where(t >= 0, self._acp[safe], self._final_acp)

    def add_laplace_noise(self, key, sample, t):
        """Forward Laplace noising x + Laplace(0, sqrt(1-alpha_bar_t)) — the
        core L-Diffusion novelty (reference ``ldiffusion.py:234-237``)."""
        scale = jnp.sqrt(1.0 - self._alpha(t)).astype(sample.dtype)
        noise = jax.random.laplace(key, sample.shape, sample.dtype)
        return sample + noise * scale


class PNDMScheduler(_SchedulerBase):
    """PLMS (PNDM with skip_prk_steps=True), SD v1.5's default scheduler."""

    def set_timesteps(self, num_inference_steps: int) -> Timesteps:
        T = self.schedule.num_train_timesteps
        num_inference_steps = min(num_inference_steps, T)
        ratio = T // num_inference_steps
        base = (np.arange(0, num_inference_steps) * ratio).round().astype(np.int64)
        base += self.schedule.steps_offset
        # PLMS duplicates the second-to-last step (diffusers PNDM
        # set_timesteps with skip_prk_steps): for n>1 this yields n+1 visits.
        # The reference's warm-up trajectory loop iterates these verbatim, so
        # the trajectory feature has len(timesteps) channels.
        if num_inference_steps > 1:
            plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
        else:
            plms = base[::-1]
        return Timesteps(tuple(int(t) for t in plms), num_inference_steps, ratio)

    def init_state(self, latent_shape, dtype=jnp.float32) -> PNDMState:
        return PNDMState(
            ets=jnp.zeros((4,) + tuple(latent_shape), dtype),
            counter=jnp.zeros((), jnp.int32),
            cur_sample=jnp.zeros(latent_shape, dtype),
        )

    def scale_model_input(self, sample, t=None):
        return sample  # identity for PNDM

    def step(self, ts: Timesteps, state: PNDMState, model_output, t, sample):
        """One PLMS reverse step. ``t`` may be traced (from a scan)."""
        ratio = ts.step_ratio
        counter = state.counter

        is_c1 = counter == 1
        # counter != 1: shift-append model_output into the ets ring
        ets_new = jnp.concatenate([state.ets[1:], model_output[None]], axis=0)
        ets = jnp.where(is_c1, state.ets, ets_new)
        prev_t = jnp.where(is_c1, t, t - ratio)
        t_eff = jnp.where(is_c1, t + ratio, t)

        e1, e2, e3, e4 = ets[-1], ets[-2], ets[-3], ets[-4]
        branch = jnp.clip(counter, 0, 4)
        mo = jax.lax.switch(
            branch,
            [
                lambda: model_output,                      # counter 0
                lambda: (model_output + e1) / 2,           # counter 1
                lambda: (3 * e1 - e2) / 2,                 # counter 2
                lambda: (23 * e1 - 16 * e2 + 5 * e3) / 12,  # counter 3
                lambda: (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24,
            ],
        )
        sample_eff = jnp.where(is_c1, state.cur_sample, sample)
        cur_sample = jnp.where(counter == 0, sample, state.cur_sample)

        prev = self._get_prev_sample(sample_eff, t_eff, prev_t, mo)
        return prev, PNDMState(ets=ets, counter=counter + 1, cur_sample=cur_sample)

    def _get_prev_sample(self, sample, t, prev_t, model_output):
        a_t = self._alpha(t).astype(sample.dtype)
        a_prev = self._alpha(prev_t).astype(sample.dtype)
        b_t = 1.0 - a_t
        b_prev = 1.0 - a_prev
        sample_coeff = jnp.sqrt(a_prev / a_t)
        denom = a_t * jnp.sqrt(b_prev) + jnp.sqrt(a_t * b_t * a_prev)
        return sample_coeff * sample - (a_prev - a_t) * model_output / denom


class DDIMScheduler(_SchedulerBase):
    """Deterministic DDIM (eta=0)."""

    def set_timesteps(self, num_inference_steps: int) -> Timesteps:
        T = self.schedule.num_train_timesteps
        ratio = T // num_inference_steps
        tsv = (np.arange(0, num_inference_steps) * ratio).round()[::-1].astype(np.int64)
        tsv += self.schedule.steps_offset
        return Timesteps(tuple(int(t) for t in tsv), num_inference_steps, ratio)

    def init_state(self, latent_shape, dtype=jnp.float32) -> DDIMState:
        return DDIMState(counter=jnp.zeros((), jnp.int32))

    def scale_model_input(self, sample, t=None):
        return sample

    def step(self, ts: Timesteps, state: DDIMState, model_output, t, sample):
        a_t = self._alpha(t).astype(sample.dtype)
        a_prev = self._alpha(t - ts.step_ratio).astype(sample.dtype)
        pred_x0 = (sample - jnp.sqrt(1.0 - a_t) * model_output) / jnp.sqrt(a_t)
        direction = jnp.sqrt(1.0 - a_prev) * model_output
        prev = jnp.sqrt(a_prev) * pred_x0 + direction
        return prev, DDIMState(counter=state.counter + 1)


class LMSScheduler(_SchedulerBase):
    """Linear multistep (k-diffusion style) over interpolated sigmas.

    Matches diffusers' LMSDiscreteScheduler (imported by the reference,
    ``model/loss.py:5``). LMS integration coefficients are computed on host at
    ``set_timesteps`` time so the step itself is a static linear combination.
    """

    def __init__(self, schedule: Optional[NoiseSchedule] = None, order: int = 4):
        super().__init__(schedule)
        self.lms_order = order

    def set_timesteps(self, num_inference_steps: int) -> Timesteps:
        T = self.schedule.num_train_timesteps
        tsv = np.linspace(0, T - 1, num_inference_steps, dtype=np.float64)[::-1]
        sig_all = self.schedule.sigmas
        sigmas = np.interp(tsv[::-1], np.arange(T), sig_all)[::-1]
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float64)
        self._sigmas = sigmas
        self._coeffs = self._lms_coeff_table(sigmas, num_inference_steps)
        self._sigmas_jnp = jnp.asarray(sigmas, jnp.float32)
        self._coeffs_jnp = jnp.asarray(self._coeffs, jnp.float32)
        return Timesteps(
            tuple(int(round(t)) for t in tsv), num_inference_steps, max(1, T // num_inference_steps)
        )

    def _lms_coeff_table(self, sigmas: np.ndarray, n: int) -> np.ndarray:
        from scipy import integrate

        table = np.zeros((n, self.lms_order), dtype=np.float64)
        for step in range(n):
            order = min(step + 1, self.lms_order)
            for cur in range(order):
                def fn(tau, cur=cur, step=step, order=order):
                    prod = 1.0
                    for k in range(order):
                        if cur == k:
                            continue
                        prod *= (tau - sigmas[step - k]) / (sigmas[step - cur] - sigmas[step - k])
                    return prod

                table[step, cur] = integrate.quad(
                    fn, sigmas[step], sigmas[step + 1], epsrel=1e-4
                )[0]
        return table

    def init_state(self, latent_shape, dtype=jnp.float32) -> LMSState:
        return LMSState(
            derivatives=jnp.zeros((self.lms_order,) + tuple(latent_shape), dtype),
            counter=jnp.zeros((), jnp.int32),
        )

    def scale_model_input(self, sample, step_index):
        sigma = self._sigmas_jnp[step_index].astype(sample.dtype)
        return sample / jnp.sqrt(sigma ** 2 + 1.0)

    def step(self, ts: Timesteps, state: LMSState, model_output, step_index, sample):
        """``step_index`` is the loop index (0..n-1), not the timestep value."""
        sigma = self._sigmas_jnp[step_index].astype(sample.dtype)
        pred_x0 = sample - sigma * model_output
        deriv = (sample - pred_x0) / sigma
        derivs = jnp.concatenate([state.derivatives[1:], deriv[None]], axis=0)
        # coeffs[step, cur] multiplies derivative (step - cur) == derivs[-1-cur]
        coeffs = self._coeffs_jnp[step_index]  # (order,)
        contrib = sum(
            coeffs[cur].astype(sample.dtype) * derivs[-1 - cur] for cur in range(self.lms_order)
        )
        prev = sample + contrib
        return prev, LMSState(derivatives=derivs, counter=state.counter + 1)


def make_scheduler(name: str = "pndm", schedule: Optional[NoiseSchedule] = None):
    name = name.lower()
    if name in ("pndm", "plms"):
        return PNDMScheduler(schedule)
    if name == "ddim":
        return DDIMScheduler(schedule)
    if name in ("lms", "lmsdiscrete"):
        return LMSScheduler(schedule)
    raise ValueError(f"unknown scheduler: {name}")
