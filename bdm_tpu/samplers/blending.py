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

import functools
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


@functools.partial(jax.jit, static_argnums=(0, 1))
def _jitted_fused_rolls(pc2: PC2Model, pvd: PVDModel, pc2_params,
                        pvd_params, x, camera, cond_map, ts_recon, ts_prior,
                        keys_r, keys_p):
    """Both one-roll milestone branches in ONE executable.

    At an interior milestone the recon roll and the prior roll start from
    the SAME x_t and are data-independent (`main_blending.py:316-325`);
    running them as two sequential jitted windows leaves the chip idle in
    each program's gather/scatter latency gaps. One scan whose body holds
    both denoise chains lets XLA's latency-hiding scheduler interleave
    them. Key plumbing matches the sequential path bit-for-bit (each
    branch consumes its own pre-split key array), DDPM only — the DDIM
    mapping gives the branches unequal window lengths.
    """
    sched = pc2.schedulers["ddpm"]
    b = x.shape[0]
    denoise_p = pvd.denoise_fn(pvd_params)

    def body(carry, inp):
        xr, xp = carry
        t_r, t_p, k_r, k_p = inp
        eps = pc2.denoise(pc2_params, xr,
                          jnp.full((b,), t_r, dtype=jnp.int32), camera,
                          cond_map)
        xr = sched.step(eps, t_r, xr, k_r)
        xp = pvd.diffusion.p_sample(
            denoise_p, xp, jnp.full((b,), t_p, dtype=jnp.int32), k_p,
            clip_denoised=False)
        return (xr, xp), None

    (xr, xp), _ = jax.lax.scan(body, (x, x),
                               (ts_recon, ts_prior, keys_r, keys_p))
    return xr, xp


def fused_branch_rolls(pc2: PC2Model, pc2_params, pvd: PVDModel, pvd_params,
                       x, camera, cond_map, recon_start: int,
                       recon_end: int, prior_start: int, prior_end: int,
                       k_recon: jax.Array, k_prior: jax.Array,
                       num_inference_steps: int = 1000):
    """Run the recon window [recon_start, recon_end) and the prior window
    [prior_start, prior_end) from the same x in one fused program.
    Equals pc2.interaction_sample + pvd.generate_window called with the
    same keys. Requires equal window lengths (DDPM schedules)."""
    sched = pc2.schedulers["ddpm"]
    timesteps = sched.set_timesteps(num_inference_steps)
    ts_recon = jnp.asarray(
        list(timesteps[num_inference_steps - recon_start:
                       num_inference_steps - recon_end]), jnp.int32)
    ts_prior = jnp.arange(prior_start - 1, prior_end - 1, -1,
                          dtype=jnp.int32)
    steps = len(ts_recon)
    assert steps == len(ts_prior), (steps, len(ts_prior))
    keys_r = jax.random.split(k_recon, steps)
    keys_p = jax.random.split(k_prior, steps)
    from bdm_tpu.utils.aot_cache import aot_call
    return aot_call(
        _jitted_fused_rolls, (pc2, pvd),
        (pc2_params, pvd_params, x, camera, cond_map, ts_recon, ts_prior,
         keys_r, keys_p),
        tag="bdm-fused-rolls",
        static_key=f"{pc2.aot_static_key()}&{pvd.aot_static_key()}")


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
    cond_map = pc2.maybe_precontract(pc2_params, cond_map)

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
            if scheduler == "ddpm":
                # both branch rolls in one fused executable (equal window
                # lengths under DDPM); bit-identical key plumbing
                out_recon, out_prior = fused_branch_rolls(
                    pc2, pc2_params, pvd, pvd_params, x, batch["camera"],
                    cond_map, milestones[i + 1],
                    milestones[i + 1] - roll_step, prior_milestones[i + 1],
                    prior_milestones[i + 1] - prior_roll_step, k_r, k_p,
                    num_inference_steps)
            else:
                # branch 1: recon one roll-step
                out_recon = recon(x, milestones[i + 1],
                                  milestones[i + 1] - roll_step, k_r)
                # branch 2: prior one (prior-)roll-step
                out_prior = pvd.generate_window(
                    pvd_params, x, prior_milestones[i + 1],
                    prior_milestones[i + 1] - prior_roll_step, k_p)
            x = blend_point_clouds(out_recon, out_prior, k_mix)
    return x
