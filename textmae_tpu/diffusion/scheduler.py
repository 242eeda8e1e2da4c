"""Euler discrete scheduler (the SDXL refiner's default sampler).

Pure-function re-statement of the k-diffusion Euler method as diffusers
configures it for stabilityai/stable-diffusion-xl-refiner-1.0
(scheduler_config.json: scaled_linear betas 0.00085..0.012 over 1000 train
steps, "leading" timestep spacing, epsilon prediction). The denoise loop in
textmae_tpu.diffusion.refiner consumes the precomputed (timesteps, sigmas)
arrays with `lax.scan`, so everything here is host-side numpy executed once
per configuration — no stateful scheduler object to thread through jit.

Reference obligation: /root/reference/models/Diffusion/__init__.py:8-28 wraps
the diffusers pipeline whose sampling math this replaces TPU-natively.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class EulerSchedule:
    """Precomputed denoise schedule.

    timesteps: (S,) float32 — UNet conditioning timesteps, descending.
    sigmas:    (S + 1,) float32 — noise levels per step; sigmas[-1] == 0.
    """

    timesteps: np.ndarray
    sigmas: np.ndarray

    @property
    def init_sigma(self) -> float:
        """Scale/noise level for the first step's input."""
        return float(self.sigmas[0])


def training_sigmas(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
) -> np.ndarray:
    """sigma(t) = sqrt((1 - abar_t) / abar_t) for the scaled-linear beta grid."""
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps) ** 2
    abar = np.cumprod(1.0 - betas)
    return np.sqrt((1.0 - abar) / abar).astype(np.float32)


def euler_schedule(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    steps_offset: int = 1,
) -> EulerSchedule:
    """'leading' timestep spacing: t_i = round(i * (T // S)) + offset, reversed."""
    all_sigmas = training_sigmas(num_train_timesteps, beta_start, beta_end)
    ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * ratio).round()[::-1].astype(np.float32)
    ts = ts + steps_offset
    sig = np.interp(ts, np.arange(num_train_timesteps), all_sigmas)
    return EulerSchedule(
        timesteps=ts.astype(np.float32),
        sigmas=np.concatenate([sig, [0.0]]).astype(np.float32),
    )


def img2img_slice(schedule: EulerSchedule, strength: float) -> EulerSchedule:
    """Drop the first (1 - strength) of the schedule (img2img starts from a
    partially-noised input rather than pure noise)."""
    s = len(schedule.timesteps)
    start = min(int(s * (1.0 - strength)), s - 1)
    return EulerSchedule(
        timesteps=schedule.timesteps[start:], sigmas=schedule.sigmas[start:]
    )


def scale_model_input(sample, sigma):
    """Euler ancestral-free input scaling: x / sqrt(sigma^2 + 1)."""
    return sample / (sigma ** 2 + 1.0) ** 0.5


def euler_step(sample, eps, sigma, sigma_next):
    """One deterministic Euler step for epsilon-prediction models.

    x0_hat = x - sigma * eps; dx/dsigma = (x - x0_hat) / sigma = eps.
    """
    return sample + eps * (sigma_next - sigma)


def add_noise(sample, noise, sigma):
    """Noise a clean (VAE-scaled) latent up to `sigma` (img2img init)."""
    return sample + noise * sigma
