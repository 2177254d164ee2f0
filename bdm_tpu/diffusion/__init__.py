"""Diffusion schedulers: pure-JAX DDPM/DDIM and the PVD Gaussian diffusion.

These replace the reference's dependency on `diffusers==0.21.0`
(`experiments/model/model.py:8-10,40-66`) and its hand-rolled
`GaussianDiffusion` (`experiments/pvd/__init__.py:18-297`). All step math
is closed-form and jit/scan friendly (tables gathered at traced timesteps).
"""

from bdm_tpu.diffusion.schedules import (
    linear_betas,
    custom_betas,
    pvd_betas,
)
from bdm_tpu.diffusion.ddpm import DDPMScheduler
from bdm_tpu.diffusion.ddim import DDIMScheduler
from bdm_tpu.diffusion.pndm import PNDMScheduler, PNDMState
from bdm_tpu.diffusion.gaussian import GaussianDiffusion

__all__ = [
    "linear_betas",
    "custom_betas",
    "pvd_betas",
    "DDPMScheduler",
    "DDIMScheduler",
    "PNDMScheduler",
    "PNDMState",
    "GaussianDiffusion",
]


def make_scheduler(name: str, beta_start: float, beta_end: float,
                   beta_schedule: str = "linear", num_train_timesteps: int = 1000):
    """Scheduler factory mirroring the reference's `schedulers_map`
    (`model.py:58-62`): DDPM/DDIM built from the same betas, clip_sample off.
    """
    if beta_schedule == "custom":
        betas = custom_betas(beta_start, beta_end,
                             num_train_timesteps=num_train_timesteps)
    elif beta_schedule == "linear":
        betas = linear_betas(beta_start, beta_end, num_train_timesteps)
    else:
        raise ValueError(f"Unknown beta schedule: {beta_schedule}")
    if name == "ddpm":
        return DDPMScheduler(betas)
    if name == "ddim":
        return DDIMScheduler(betas)
    if name == "pndm":
        return PNDMScheduler(betas)
    raise ValueError(f"Unknown scheduler: {name}")
