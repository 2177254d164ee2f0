"""DDPM scheduler with diffusers==0.21.0 step semantics.

The reference builds `DDPMScheduler(clip_sample=False)` with default
variance_type='fixed_small' and prediction_type='epsilon'
(`model/model.py:58-62`). This is the same closed-form math, expressed so a
traced timestep can be gathered inside `lax.scan`:

    x0_hat  = (x_t - sqrt(1-acp_t) * eps) / sqrt(acp_t)
    mu      = sqrt(acp_prev)*beta_t/(1-acp_t) * x0_hat
              + sqrt(alpha_t)*(1-acp_prev)/(1-acp_t) * x_t
    var     = (1-acp_prev)/(1-acp_t) * beta_t          (clamped >= 1e-20)
    x_prev  = mu + sqrt(var) * z                        (z only when t > 0)

where alpha_t/beta_t are the *current* (possibly strided) alpha/beta:
alpha_t = acp_t / acp_prev.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class DDPMScheduler:
    """Functional DDPM stepper. Tables are baked into jitted graphs."""

    def __init__(self, betas: np.ndarray):
        betas = np.asarray(betas, dtype=np.float64)
        self.num_train_timesteps = len(betas)
        alphas_cumprod = np.cumprod(1.0 - betas)
        self.betas = jnp.asarray(betas, dtype=jnp.float32)
        self.alphas_cumprod = jnp.asarray(alphas_cumprod, dtype=jnp.float32)
        self.sqrt_acp = jnp.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_acp = jnp.sqrt(1.0 - self.alphas_cumprod)
        self._num_inference_steps = self.num_train_timesteps

    # ------------------------------------------------------------- timesteps
    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending inference timesteps, diffusers 0.21 spacing:
        round(arange(S) * (T // S)) reversed."""
        self._num_inference_steps = int(num_inference_steps)
        return self.timesteps()

    def timesteps(self, num_inference_steps: int | None = None) -> np.ndarray:
        s = int(num_inference_steps or self._num_inference_steps)
        step_ratio = self.num_train_timesteps // s
        return (np.arange(0, s) * step_ratio).round()[::-1].astype(np.int32)

    @property
    def step_ratio(self) -> int:
        return self.num_train_timesteps // self._num_inference_steps

    # ------------------------------------------------------------- q process
    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        """q(x_t | x_0). t: () or (B,) int."""
        t = jnp.asarray(t)
        shape = (-1,) + (1,) * (x0.ndim - 1) if t.ndim else ()
        a = self.sqrt_acp[t].reshape(shape) if t.ndim else self.sqrt_acp[t]
        s = (self.sqrt_one_minus_acp[t].reshape(shape) if t.ndim
             else self.sqrt_one_minus_acp[t])
        return a * x0 + s * noise

    # ------------------------------------------------------------ p process
    def _acp_prev(self, prev_t: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(prev_t >= 0,
                         self.alphas_cumprod[jnp.clip(prev_t, 0)],
                         jnp.float32(1.0))

    def step(self, eps: jnp.ndarray, t: jnp.ndarray, x_t: jnp.ndarray,
             key: jax.Array) -> jnp.ndarray:
        """One reverse step x_t -> x_{t-step_ratio}. `t` may be traced."""
        t = jnp.asarray(t, dtype=jnp.int32)
        prev_t = t - self.step_ratio
        acp_t = self.alphas_cumprod[t]
        acp_prev = self._acp_prev(prev_t)
        beta_prod_t = 1.0 - acp_t
        beta_prod_prev = 1.0 - acp_prev
        current_alpha = acp_t / acp_prev
        current_beta = 1.0 - current_alpha

        x0_hat = (x_t - jnp.sqrt(beta_prod_t) * eps) / jnp.sqrt(acp_t)
        coef_x0 = jnp.sqrt(acp_prev) * current_beta / beta_prod_t
        coef_xt = jnp.sqrt(current_alpha) * beta_prod_prev / beta_prod_t
        mean = coef_x0 * x0_hat + coef_xt * x_t

        variance = jnp.maximum(beta_prod_prev / beta_prod_t * current_beta,
                               1e-20)
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
        nonzero = (t > 0).astype(x_t.dtype)
        return mean + nonzero * jnp.sqrt(variance) * noise
