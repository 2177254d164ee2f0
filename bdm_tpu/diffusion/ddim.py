"""DDIM scheduler with diffusers==0.21.0 step semantics (clip_sample=False,
steps_offset=0, eta configurable; reference uses eta=0 — `model.py:134,169`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class DDIMScheduler:
    def __init__(self, betas: np.ndarray):
        betas = np.asarray(betas, dtype=np.float64)
        self.num_train_timesteps = len(betas)
        alphas_cumprod = np.cumprod(1.0 - betas)
        self.alphas_cumprod = jnp.asarray(alphas_cumprod, dtype=jnp.float32)
        self.final_alpha_cumprod = jnp.float32(1.0)  # set_alpha_to_one default
        self._num_inference_steps = self.num_train_timesteps

    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        self._num_inference_steps = int(num_inference_steps)
        return self.timesteps()

    def timesteps(self, num_inference_steps: int | None = None) -> np.ndarray:
        s = int(num_inference_steps or self._num_inference_steps)
        step_ratio = self.num_train_timesteps // s
        return (np.arange(0, s) * step_ratio).round()[::-1].astype(np.int32)

    @property
    def step_ratio(self) -> int:
        return self.num_train_timesteps // self._num_inference_steps

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        t = jnp.asarray(t)
        sqrt_acp = jnp.sqrt(self.alphas_cumprod[t])
        sqrt_om = jnp.sqrt(1.0 - self.alphas_cumprod[t])
        if t.ndim:
            shape = (-1,) + (1,) * (x0.ndim - 1)
            sqrt_acp, sqrt_om = sqrt_acp.reshape(shape), sqrt_om.reshape(shape)
        return sqrt_acp * x0 + sqrt_om * noise

    def step(self, eps: jnp.ndarray, t: jnp.ndarray, x_t: jnp.ndarray,
             key: jax.Array | None = None, eta: float = 0.0) -> jnp.ndarray:
        """One DDIM reverse step. `t` may be traced. `key` only needed if
        eta > 0."""
        t = jnp.asarray(t, dtype=jnp.int32)
        prev_t = t - self.step_ratio
        acp_t = self.alphas_cumprod[t]
        acp_prev = jnp.where(prev_t >= 0,
                             self.alphas_cumprod[jnp.clip(prev_t, 0)],
                             self.final_alpha_cumprod)
        beta_prod_t = 1.0 - acp_t

        x0_hat = (x_t - jnp.sqrt(beta_prod_t) * eps) / jnp.sqrt(acp_t)

        variance = ((1.0 - acp_prev) / (1.0 - acp_t)) * (1.0 - acp_t / acp_prev)
        std = eta * jnp.sqrt(variance)
        direction = jnp.sqrt(1.0 - acp_prev - std ** 2) * eps
        prev = jnp.sqrt(acp_prev) * x0_hat + direction
        if eta > 0:
            assert key is not None, "eta > 0 requires a PRNG key"
            prev = prev + std * jax.random.normal(key, x_t.shape, x_t.dtype)
        return prev
