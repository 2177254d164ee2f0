"""PVD-style Gaussian diffusion (the prior model's scheduler).

Reference: `experiments/pvd/__init__.py:18-297` — tables computed in float64
then cast to float32, eps-prediction, 'fixedsmall' posterior variance with
log clipped at 1e-20, no noise at t == 0, and a partial-window
`p_sample_loop(data, start_time, final_time)` stepping every integer
timestep from start_time-1 down to final_time.

TPU design: the window loop is a `lax.scan` over a static-length window
(BDM milestone windows are small static ints), fully jittable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class GaussianDiffusion:
    def __init__(self, betas: np.ndarray, model_var_type: str = "fixedsmall"):
        betas = np.asarray(betas, dtype=np.float64)
        assert (betas > 0).all() and (betas <= 1).all()
        self.num_timesteps = len(betas)
        self.model_var_type = model_var_type

        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])

        posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)

        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)  # noqa: E731
        self.betas = f32(betas)
        self.alphas_cumprod = f32(acp)
        self.sqrt_alphas_cumprod = f32(np.sqrt(acp))
        self.sqrt_one_minus_alphas_cumprod = f32(np.sqrt(1.0 - acp))
        self.sqrt_recip_alphas_cumprod = f32(np.sqrt(1.0 / acp))
        self.sqrt_recipm1_alphas_cumprod = f32(np.sqrt(1.0 / acp - 1.0))
        self.posterior_variance = f32(posterior_variance)
        self.posterior_log_variance_clipped = f32(
            np.log(np.maximum(posterior_variance, 1e-20)))
        self.posterior_mean_coef1 = f32(
            betas * np.sqrt(acp_prev) / (1.0 - acp))
        self.posterior_mean_coef2 = f32(
            (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp))
        if model_var_type == "fixedlarge":
            self.fixedlarge_log_variance = f32(np.log(np.concatenate(
                [posterior_variance[1:2], betas[1:]])))

    # --------------------------------------------------------------- helpers
    @staticmethod
    def _bcast(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        """Gather table[t] and reshape (B,) -> (B, 1, ..., 1)."""
        out = table[t]
        return out.reshape(out.shape + (1,) * (ndim - 1))

    # -------------------------------------------------------------- q / stats
    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray,
                 noise: jnp.ndarray) -> jnp.ndarray:
        return (self._bcast(self.sqrt_alphas_cumprod, t, x0.ndim) * x0
                + self._bcast(self.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
                * noise)

    def predict_xstart_from_eps(self, x_t, t, eps):
        return (self._bcast(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
                - self._bcast(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)
                * eps)

    def q_posterior_mean(self, x0, x_t, t):
        return (self._bcast(self.posterior_mean_coef1, t, x_t.ndim) * x0
                + self._bcast(self.posterior_mean_coef2, t, x_t.ndim) * x_t)

    # ------------------------------------------------------------- p process
    def p_sample(self, denoise_fn, x_t: jnp.ndarray, t: jnp.ndarray,
                 key: jax.Array, clip_denoised: bool = False,
                 use_var: bool = True) -> jnp.ndarray:
        """One reverse step. t: (B,) int32 (all equal in the BDM loops)."""
        eps = denoise_fn(x_t, t)
        x0_hat = self.predict_xstart_from_eps(x_t, t, eps)
        if clip_denoised:
            x0_hat = jnp.clip(x0_hat, -0.5, 0.5)
        mean = self.q_posterior_mean(x0_hat, x_t, t)
        if not use_var:
            return mean
        if self.model_var_type == "fixedsmall":
            log_var = self._bcast(self.posterior_log_variance_clipped, t,
                                  x_t.ndim)
        elif self.model_var_type == "fixedlarge":
            log_var = self._bcast(self.fixedlarge_log_variance, t, x_t.ndim)
        else:
            raise NotImplementedError(self.model_var_type)
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
        nonzero = (t != 0).astype(x_t.dtype).reshape(
            (-1,) + (1,) * (x_t.ndim - 1))
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    def p_sample_window(self, denoise_fn, data: jnp.ndarray, start_time: int,
                        final_time: int, key: jax.Array,
                        clip_denoised: bool = False) -> jnp.ndarray:
        """Reverse-diffuse from t=start_time-1 down to t=final_time
        (`pvd/__init__.py:226-270`). Window bounds are static -> one scan.
        """
        start_time = int(start_time)
        final_time = int(final_time)
        steps = start_time - final_time
        if steps <= 0:
            return data
        b = data.shape[0]
        ts = jnp.arange(start_time - 1, final_time - 1, -1, dtype=jnp.int32)
        keys = jax.random.split(key, steps)

        def body(x, inp):
            t_scalar, k = inp
            t = jnp.full((b,), t_scalar, dtype=jnp.int32)
            return self.p_sample(denoise_fn, x, t, k,
                                 clip_denoised=clip_denoised), None

        out, _ = jax.lax.scan(body, data, (ts, keys))
        return out
