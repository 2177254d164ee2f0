"""PVD: the unconditional point-cloud diffusion prior.

Functional rebuild of `pvd.Model` + `prepare_pvd_model` + `generate_pvd_xyz`
(`pvd/__init__.py:335-496`): a PVCNN2 backbone with no extra feature
channels, driven by the 'fixedsmall' GaussianDiffusion with betas
linear(1e-4, 0.02, 1000). Inference-only in BDM (its training entry points
are undefined in the reference — SURVEY.md #13) but our `loss` enables
training a prior from scratch.

Layout note: the reference PVD is channel-first (B, 3, N) and BDM permutes
around every call (`main_blending.py:176-183`); bdm_tpu is channel-last
(B, N, 3) everywhere, so no permutes exist.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bdm_tpu.diffusion import GaussianDiffusion, pvd_betas
from bdm_tpu.models.pvcnn import PVCNN2


class PVDModel:
    def __init__(self, embed_dim: int = 64, use_att: bool = True,
                 dropout: float = 0.1, beta_start: float = 1e-4,
                 beta_end: float = 2e-2, num_timesteps: int = 1000,
                 schedule_type: str = "linear",
                 model_var_type: str = "fixedsmall",
                 sa_blocks=None, fp_blocks=None,
                 mixed_precision: str = "no"):
        from bdm_tpu.samplers.pc2 import compute_dtype_of
        backbone_kwargs = {}
        if sa_blocks is not None:
            backbone_kwargs["sa_blocks"] = sa_blocks
        if fp_blocks is not None:
            backbone_kwargs["fp_blocks"] = fp_blocks
        self.compute_dtype = compute_dtype_of(mixed_precision)
        self.backbone = PVCNN2(
            out_channels=3, embed_dim=embed_dim, extra_feature_channels=0,
            use_att=use_att, dropout=dropout, classifier_init_scale=None,
            dtype=self.compute_dtype, **backbone_kwargs)
        self.diffusion = GaussianDiffusion(
            pvd_betas(schedule_type, beta_start, beta_end, num_timesteps),
            model_var_type=model_var_type)

    def init_params(self, key: jax.Array, num_points: int = 128):
        return self.backbone.init(key, jnp.zeros((1, num_points, 3)),
                                  jnp.zeros((1,), jnp.int32))

    def aot_static_key(self) -> str:
        """Stable static-graph description (see utils/aot_cache.py). The
        beta tables are trace-time constants, so they are part of the key
        (hashed)."""
        import hashlib
        import numpy as _np
        bh = hashlib.sha256(
            _np.asarray(self.diffusion.betas, _np.float64).tobytes()
        ).hexdigest()[:12]
        return (f"pvd|{self.backbone.embed_dim}|{self.backbone.use_att}|"
                f"{self.backbone.dropout}|{self.backbone.sa_blocks!r}|"
                f"{self.backbone.fp_blocks!r}|{self.backbone.dtype!r}|"
                f"{self.diffusion.model_var_type}|{bh}")

    def denoise_fn(self, params):
        def fn(x, t):
            return self.backbone.apply(params, x, t, deterministic=True)
        return fn

    def loss(self, params, x0: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """eps-MSE (the reference's undefined `p_losses` reconstructed from
        its eps-prediction usage)."""
        b = x0.shape[0]
        k_t, k_noise, k_drop = jax.random.split(key, 3)
        t = jax.random.randint(k_t, (b,), 0, self.diffusion.num_timesteps)
        noise = jax.random.normal(k_noise, x0.shape, x0.dtype)
        x_t = self.diffusion.q_sample(x0, t, noise)
        eps = self.backbone.apply(params, x_t, t, deterministic=False,
                                  rngs={"dropout": k_drop})
        return jnp.mean((eps - noise) ** 2)

    def generate_window(self, params, x: jnp.ndarray, start_time: int,
                        final_time: int, key: jax.Array,
                        clip_denoised: bool = False) -> jnp.ndarray:
        """Partial-window sampling (`generate_pvd_xyz`,
        `pvd/__init__.py:450-473`): reverse-diffuse x from t=start_time-1
        down to t=final_time. x: (B, N, 3).

        The timestep array is a traced input of one jitted scan, so all
        windows of equal length share one executable."""
        start_time, final_time = int(start_time), int(final_time)
        steps = start_time - final_time
        if steps <= 0:
            return x
        ts = jnp.arange(start_time - 1, final_time - 1, -1, dtype=jnp.int32)
        keys = jax.random.split(key, steps)
        from bdm_tpu.utils.aot_cache import aot_call
        return aot_call(
            _jitted_pvd_window, (self, bool(clip_denoised)),
            (params, x, ts, keys), tag="pvd-window",
            static_key=f"{self.aot_static_key()}|{bool(clip_denoised)}")

    def sample(self, params, shape, key: jax.Array) -> jnp.ndarray:
        """Unconditional generation from pure noise."""
        k0, k1 = jax.random.split(key)
        x = jax.random.normal(k0, shape, jnp.float32)
        return self.generate_window(params, x,
                                    self.diffusion.num_timesteps, 0, k1)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _jitted_pvd_window(pvd: "PVDModel", clip_denoised: bool, params, x, ts,
                       keys) -> jnp.ndarray:
    b = x.shape[0]
    denoise = pvd.denoise_fn(params)

    def body(carry, inp):
        t_scalar, k = inp
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        out = pvd.diffusion.p_sample(denoise, carry, t, k,
                                     clip_denoised=clip_denoised)
        return out, None

    out, _ = jax.lax.scan(body, x, (ts, keys))
    return out
