"""PNDM scheduler (pseudo numerical methods for diffusion models).

Replicates diffusers==0.21.0 `PNDMScheduler` (the third entry of the
reference's scheduler map, `model/model.py:10,61,357`) with its defaults:
`skip_prk_steps=False`, `set_alpha_to_one=False`, `steps_offset=0`,
epsilon prediction.

The diffusers implementation is stateful (an `ets` history list, a step
counter, and the Runge-Kutta scratch). For TPU the state is explicit — a
`PNDMState` pytree threaded through `step`, so the whole reverse loop is a
single `lax.scan` with no Python-side mutation. All per-step branch
decisions (PRK vs PLMS phase, RK sub-step, warmup order) reduce to
`jnp.where` selects on the carried counter, which XLA fuses into the
elementwise step math.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class PNDMState(NamedTuple):
    """Explicit functional form of diffusers' PNDM mutable state."""

    ets: jnp.ndarray               # (4, *x.shape), newest at index -1
    n_ets: jnp.ndarray             # () int32, number of valid entries
    counter: jnp.ndarray           # () int32, diffusers' `self.counter`
    cur_model_output: jnp.ndarray  # (*x.shape), RK accumulator
    cur_sample: jnp.ndarray        # (*x.shape), RK anchor sample


class PNDMScheduler:
    """Functional PNDM. Usage:

        ts = sched.set_timesteps(n)
        state = sched.init_state(x.shape)
        for t in ts:   # or lax.scan
            eps = model(x, t)
            x, state = sched.step(eps, t, x, state)
    """

    order = 1
    pndm_order = 4

    def __init__(self, betas: np.ndarray, skip_prk_steps: bool = False):
        betas = np.asarray(betas, dtype=np.float64)
        self.num_train_timesteps = len(betas)
        acp = np.cumprod(1.0 - betas)
        self.alphas_cumprod = jnp.asarray(acp, dtype=jnp.float32)
        # set_alpha_to_one=False default: reuse the first alpha product
        self.final_alpha_cumprod = jnp.float32(acp[0])
        self.skip_prk_steps = bool(skip_prk_steps)
        self._num_inference_steps = self.num_train_timesteps
        self._set_schedule(self.num_train_timesteps)

    # ------------------------------------------------------------- schedule
    def _set_schedule(self, num_inference_steps: int) -> None:
        n = int(num_inference_steps)
        t_total = self.num_train_timesteps
        ratio = t_total // n
        base = (np.arange(0, n) * ratio).round().astype(np.int64)
        if self.skip_prk_steps:
            prk = np.array([], dtype=np.int64)
            # duplicate the second-to-last step (diffusers' PLMS warmup)
            plms = np.concatenate(
                [base[:-1], base[-2:-1], base[-1:]])[::-1]
        else:
            prk = np.array(base[-self.pndm_order:]).repeat(2) + np.tile(
                np.array([0, ratio // 2], dtype=np.int64), self.pndm_order)
            prk = (prk[:-1].repeat(2)[1:-1])[::-1].copy()
            plms = base[:-3][::-1]
        self._num_inference_steps = n
        self._prk_timesteps = prk.astype(np.int32)
        self._plms_timesteps = plms.astype(np.int32)
        self._prk_ts_dev = (jnp.asarray(self._prk_timesteps)
                            if len(prk) else None)

    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        self._set_schedule(num_inference_steps)
        return self.timesteps()

    def timesteps(self, num_inference_steps: int | None = None) -> np.ndarray:
        if num_inference_steps is not None:
            self._set_schedule(num_inference_steps)
        return np.concatenate(
            [self._prk_timesteps, self._plms_timesteps]).astype(np.int32)

    @property
    def step_ratio(self) -> int:
        return self.num_train_timesteps // self._num_inference_steps

    @property
    def prk_len(self) -> int:
        return len(self._prk_timesteps)

    # ----------------------------------------------------------------- state
    def init_state(self, shape, dtype=jnp.float32) -> PNDMState:
        z = jnp.zeros(shape, dtype)
        return PNDMState(
            ets=jnp.zeros((4,) + tuple(shape), dtype),
            n_ets=jnp.zeros((), jnp.int32),
            counter=jnp.zeros((), jnp.int32),
            cur_model_output=z,
            cur_sample=z,
        )

    # ------------------------------------------------------------------ math
    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        t = jnp.asarray(t)
        sqrt_acp = jnp.sqrt(self.alphas_cumprod[t])
        sqrt_om = jnp.sqrt(1.0 - self.alphas_cumprod[t])
        if t.ndim:
            shape = (-1,) + (1,) * (x0.ndim - 1)
            sqrt_acp, sqrt_om = sqrt_acp.reshape(shape), sqrt_om.reshape(shape)
        return sqrt_acp * x0 + sqrt_om * noise

    def _prev_sample(self, sample, t, prev_t, model_output):
        """diffusers `PNDMScheduler._get_prev_sample` (the shared transfer
        formula of both phases)."""
        t_max = self.num_train_timesteps - 1
        acp_t = self.alphas_cumprod[jnp.clip(t, 0, t_max)]
        acp_prev = jnp.where(
            prev_t >= 0,
            self.alphas_cumprod[jnp.clip(prev_t, 0, t_max)],
            self.final_alpha_cumprod)
        coeff = jnp.sqrt(acp_prev / acp_t)
        denom = (acp_t * jnp.sqrt(1.0 - acp_prev)
                 + jnp.sqrt(acp_t * (1.0 - acp_t) * acp_prev))
        return coeff * sample - (acp_prev - acp_t) * model_output / denom

    def step(self, eps: jnp.ndarray, t: jnp.ndarray, x_t: jnp.ndarray,
             state: PNDMState) -> tuple[jnp.ndarray, PNDMState]:
        """One PNDM reverse step; `t` and the state counter may be traced.

        Returns (prev_sample, new_state).
        """
        t = jnp.asarray(t, jnp.int32)
        ratio = self.step_ratio
        c = state.counter

        def append(ets, n, v):
            return (jnp.roll(ets, -1, axis=0).at[-1].set(v),
                    jnp.minimum(n + 1, 4))

        # ------------------------- PLMS candidate (linear multistep phase)
        is_c1 = c == 1  # reachable only with skip_prk_steps=True
        prev_t_plms = jnp.where(is_c1, t, t - ratio)
        t_plms = jnp.where(is_c1, t + ratio, t)
        ets_app, n_app = append(state.ets, state.n_ets, eps)
        ets_plms = jnp.where(is_c1, state.ets, ets_app)
        n_plms = jnp.where(is_c1, state.n_ets, n_app)
        e1, e2, e3, e4 = (ets_plms[-1], ets_plms[-2], ets_plms[-3],
                          ets_plms[-4])
        out1 = jnp.where(is_c1, (eps + e1) / 2.0, e1)
        out2 = (3.0 * e1 - e2) / 2.0
        out3 = (23.0 * e1 - 16.0 * e2 + 5.0 * e3) / 12.0
        out4 = (55.0 * e1 - 59.0 * e2 + 37.0 * e3 - 9.0 * e4) / 24.0
        out_plms = jnp.where(
            n_plms <= 1, out1,
            jnp.where(n_plms == 2, out2,
                      jnp.where(n_plms == 3, out3, out4)))
        sample_plms = jnp.where(is_c1, state.cur_sample, x_t)
        cur_sample_plms = jnp.where((n_plms <= 1) & (c == 0), x_t,
                                    state.cur_sample)
        prev_plms = self._prev_sample(sample_plms, t_plms, prev_t_plms,
                                      out_plms)
        new = PNDMState(ets_plms, n_plms, c + 1, state.cur_model_output,
                        cur_sample_plms)
        prev = prev_plms

        # --------------------------------- PRK candidate (Runge-Kutta warmup)
        if self.prk_len:
            c4 = c % 4
            diff_to_prev = jnp.where(c % 2 == 0, ratio // 2, 0)
            prev_t_prk = t - diff_to_prev
            t_prk = self._prk_ts_dev[
                jnp.clip((c // 4) * 4, 0, self.prk_len - 1)]
            cmo = state.cur_model_output
            out_prk = jnp.where(c4 == 3, cmo + eps / 6.0, eps)
            new_cmo = jnp.where(
                c4 == 0, cmo + eps / 6.0,
                jnp.where(c4 == 3, jnp.zeros_like(cmo), cmo + eps / 3.0))
            ets_prk = jnp.where(c4 == 0, ets_app, state.ets)
            n_prk = jnp.where(c4 == 0, n_app, state.n_ets)
            cur_sample_prk = jnp.where(c4 == 0, x_t, state.cur_sample)
            prev_prk = self._prev_sample(cur_sample_prk, t_prk, prev_t_prk,
                                         out_prk)
            in_prk = c < self.prk_len
            prev = jnp.where(in_prk, prev_prk, prev_plms)
            new = PNDMState(
                ets=jnp.where(in_prk, ets_prk, ets_plms),
                n_ets=jnp.where(in_prk, n_prk, n_plms),
                counter=c + 1,
                cur_model_output=jnp.where(in_prk, new_cmo,
                                           state.cur_model_output),
                cur_sample=jnp.where(in_prk, cur_sample_prk,
                                     cur_sample_plms),
            )
        return prev, new
