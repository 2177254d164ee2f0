"""Beta schedules.

References:
  * PC2 linear schedule beta in [1e-5, 8e-3] — `config/structured.py:105-107`.
  * "custom" 30%-warmup schedule — `model/model_utils.py:36-44`.
  * PVD linear / warmX schedules — `pvd/__init__.py:430-447` (linear
    [1e-4, 2e-2] used by `prepare_pvd_model`, `pvd/__init__.py:477`).
"""

from __future__ import annotations

import numpy as np


def linear_betas(beta_start: float, beta_end: float,
                 num_train_timesteps: int = 1000) -> np.ndarray:
    """diffusers-style 'linear' schedule (float32 linspace)."""
    return np.linspace(beta_start, beta_end, num_train_timesteps,
                       dtype=np.float32)


def custom_betas(beta_start: float, beta_end: float, warmup_frac: float = 0.3,
                 num_train_timesteps: int = 1000) -> np.ndarray:
    """PC2's 'custom' warmup schedule (`model_utils.py:36-44`): a float32
    linspace whose first 30% is overwritten by a float64 linspace over the
    warmup window (note the reference hard-codes warmup_frac=0.3 internally).
    """
    betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                        dtype=np.float32)
    warmup_frac = 0.3
    warmup_time = int(num_train_timesteps * warmup_frac)
    warmup_steps = np.linspace(beta_start, beta_end, warmup_time,
                               dtype=np.float64)
    warmup_time = min(warmup_time, num_train_timesteps)
    betas[:warmup_time] = warmup_steps[:warmup_time]
    return betas


def pvd_betas(schedule_type: str = "linear", b_start: float = 1e-4,
              b_end: float = 2e-2, time_num: int = 1000) -> np.ndarray:
    """PVD's beta schedules (`pvd/__init__.py:430-447`), float64 as in the
    reference (the GaussianDiffusion tables are computed in float64)."""
    if schedule_type == "linear":
        return np.linspace(b_start, b_end, time_num)
    if schedule_type.startswith("warm"):
        frac = float(schedule_type[len("warm"):])
        betas = b_end * np.ones(time_num, dtype=np.float64)
        warmup_time = int(time_num * frac)
        betas[:warmup_time] = np.linspace(b_start, b_end, warmup_time,
                                          dtype=np.float64)
        return betas
    raise NotImplementedError(schedule_type)
