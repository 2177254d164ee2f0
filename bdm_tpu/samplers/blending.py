"""BDM-Blending: the training-free coupled sampler.

Reference: `bdm_blending` (`main_blending.py:186-347`). Between milestones
the recon (PC2) branch denoises alone; at each interior milestone both
branches take one roll-step from the same x_t and the results are mixed
per-point by a fair coin (`main_blending.py:326-344`).

DDIM milestone mapping (`main_blending.py:214-222`): the recon branch runs
in 64-step DDIM space while the prior (always DDPM at full resolution) runs
prior_roll_step = 16*roll_step over milestones rescaled by 1000/64.

TPU design: milestones are static, so the whole sampler is a static Python
loop over jitted scan segments; the per-point mix uses an explicit PRNG key.
The conditioning map is computed once for the whole trajectory.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from bdm_tpu.samplers.pc2 import PC2Model
from bdm_tpu.samplers.pvd import PVDModel


def blend_point_clouds(a: jnp.ndarray, b: jnp.ndarray,
                       key: jax.Array) -> jnp.ndarray:
    """Per-point Bernoulli(0.5) mix of two aligned clouds
    (`main_blending.py:326-344`)."""
    choice = jax.random.randint(key, a.shape[:2], 0, 2)  # (B, N) in {0, 1}
    return jnp.where((choice == 0)[..., None], a, b)


def bdm_blending(pc2: PC2Model, pc2_params, pvd: PVDModel, pvd_params,
                 batch: Dict[str, Any], key: jax.Array, num_points: int,
                 milestones: Sequence[int], roll_step: int,
                 scheduler: str = "ddpm",
                 num_inference_steps: int = 1000) -> jnp.ndarray:
    """Run the coupled blending sampler for one batch.

    Returns (B, N, 3) predicted points (in the model's normalized space,
    like the reference's output before .ply export).
    """
    milestones = [int(m) for m in milestones]
    times = len(milestones) - 1
    if scheduler == "ddim":
        prior_roll_step = int(roll_step * 16)
        prior_milestones = [int(m / 64 * 1000) for m in milestones]
    else:
        assert scheduler == "ddpm", scheduler
        prior_roll_step = roll_step
        prior_milestones = milestones

    b = batch["image"].shape[0]
    k_init, key = jax.random.split(key)
    x = jax.random.normal(k_init, (b, num_points, 3), jnp.float32)
    x = x - x.mean(axis=1, keepdims=True)  # `main_blending.py:228-229`

    cond_map = pc2.conditioning_map(
        pc2_params, batch["image"], batch.get("mask"),
        batch.get("distance_transform"))

    def recon(x, start, end, k):
        return pc2.interaction_sample(
            pc2_params, x, batch, k, start_time=start, end_time=end,
            scheduler=scheduler, num_inference_steps=num_inference_steps,
            cond_map=cond_map)

    for i in range(times):
        k_seg, k_r, k_p, k_mix, key = jax.random.split(key, 5)
        if i == 0:
            x = recon(x, milestones[i], milestones[i + 1] - roll_step, k_seg)
        elif i == times - 1:
            x = recon(x, milestones[i] - roll_step, milestones[i + 1], k_seg)
        else:
            x = recon(x, milestones[i] - roll_step, milestones[i + 1], k_seg)
            # branch 1: recon one roll-step
            out_recon = recon(x, milestones[i + 1],
                              milestones[i + 1] - roll_step, k_r)
            # branch 2: prior one (prior-)roll-step
            out_prior = pvd.generate_window(
                pvd_params, x, prior_milestones[i + 1],
                prior_milestones[i + 1] - prior_roll_step, k_p)
            x = blend_point_clouds(out_recon, out_prior, k_mix)
    return x
