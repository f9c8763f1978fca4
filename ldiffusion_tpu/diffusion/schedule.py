"""Noise schedule (beta/alpha tables) for Stable-Diffusion v1.5.

SD v1.5 trains with a "scaled_linear" beta schedule: betas are the squares of
a linspace between sqrt(0.00085) and sqrt(0.012) over 1000 steps. The
cumulative products drive both Gaussian SD sampling and the reference's
Laplace noising ``scale = sqrt(1 - alpha_bar_t)`` (reference
``ldiffusion.py:234-236``).

Tables are small (1000,) float64-accurate numpy arrays computed once at trace
time; steps index them with dynamic gather under jit.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    num_train_timesteps: int
    betas: np.ndarray            # (T,)
    alphas: np.ndarray           # (T,)
    alphas_cumprod: np.ndarray   # (T,)
    steps_offset: int = 1        # SD v1.5 scheduler config
    set_alpha_to_one: bool = False

    @property
    def final_alpha_cumprod(self) -> float:
        # set_alpha_to_one=False in the SD v1.5 config: use alpha_bar[0]
        return 1.0 if self.set_alpha_to_one else float(self.alphas_cumprod[0])

    def laplace_scale(self, t) -> np.ndarray:
        """sqrt(1 - alpha_bar_t): the Laplace noise scale used by the
        reference warm-up loop (``ldiffusion.py:234``)."""
        return np.sqrt(1.0 - self.alphas_cumprod[t])

    @property
    def sigmas(self) -> np.ndarray:
        """Karras-convention sigmas used by the LMS scheduler."""
        return np.sqrt((1.0 - self.alphas_cumprod) / self.alphas_cumprod)


def scaled_linear_schedule(
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    num_train_timesteps: int = 1000,
    steps_offset: int = 1,
    set_alpha_to_one: bool = False,
) -> NoiseSchedule:
    betas = (
        np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps, dtype=np.float64) ** 2
    )
    alphas = 1.0 - betas
    return NoiseSchedule(
        num_train_timesteps=num_train_timesteps,
        betas=betas.astype(np.float32),
        alphas=alphas.astype(np.float32),
        alphas_cumprod=np.cumprod(alphas, dtype=np.float64).astype(np.float32),
        steps_offset=steps_offset,
        set_alpha_to_one=set_alpha_to_one,
    )


def sd15_schedule() -> NoiseSchedule:
    """The exact schedule shipped with SD v1.5 (PNDM scheduler config)."""
    return scaled_linear_schedule()
