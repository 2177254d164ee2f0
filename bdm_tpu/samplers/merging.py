"""BDM-Merging: the learned fusion sampler.

Reference: `PointCloudFusionModel` (`model/model.py:320-600`) and
`bdm_merging` (`main_merging.py:369-523`). At interior milestones both
branches roll to `milestone - roll_step + 1`, then a single fusion-network
forward + one scheduler step at t = milestone - roll_step produces the
merged x_{t-roll} (`nstep_fuse`, `model.py:510-570`).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from bdm_tpu.models.fusion import PVCNNFuse
from bdm_tpu.samplers.pc2 import PC2Model, ProjectionConfig
from bdm_tpu.samplers.pvd import PVDModel


class BDMMergingModel:
    """The fusion model with PC2-style conditioning.

    Parameters: {"feature_model": ..., "fusion_model": ...}. The fusion
    tree's 'pc2_encoder'/'pvd_encoder' subtrees are frozen during training
    (`model/__init__.py:27-35`); see `bdm_tpu.train.optimizers.freeze_mask`.
    """

    def __init__(self, cfg: ProjectionConfig = ProjectionConfig(),
                 pc2: Optional[PC2Model] = None,
                 sa_blocks=None, fp_blocks=None):
        self.pc2 = pc2 if pc2 is not None else PC2Model(
            cfg, sa_blocks=sa_blocks, fp_blocks=fp_blocks)
        self.cfg = self.pc2.cfg
        fusion_kwargs = {}
        if sa_blocks is not None:
            fusion_kwargs["sa_blocks"] = sa_blocks
        if fp_blocks is not None:
            fusion_kwargs["fp_blocks"] = fp_blocks
        self.fusion = PVCNNFuse(
            out_channels=self.pc2.out_channels,
            embed_dim=self.cfg.point_cloud_model_embed_dim,
            extra_feature_channels=self.pc2.in_channels - 3,
            dtype=self.pc2.compute_dtype,
            **fusion_kwargs)
        self.schedulers = self.pc2.schedulers
        self.num_train_timesteps = self.pc2.num_train_timesteps

    def init_params(self, key: jax.Array, num_points: int = 128):
        k1, k2 = jax.random.split(key)
        s = self.cfg.image_size
        feat = self.pc2.feature_model.init(
            k1, jnp.zeros((1, s, s, 3), jnp.float32))
        fuse = self.fusion.init(
            k2, jnp.zeros((1, num_points, self.pc2.in_channels)),
            jnp.zeros((1, num_points, 3)), jnp.zeros((1,), jnp.int32),
            "fusion_nstep")
        return {"feature_model": feat, "fusion_model": fuse}

    def init_from_pretrained(self, key: jax.Array, pc2_params, pvd_params,
                             num_points: int = 128):
        """Initialize fusion params from pretrained PC2 + PVD, replicating
        `pvcnn_fuse.py:30-36,99-105`: towers = the pretrained encoders;
        decoder/embedf = copies of PC2's; projs stay zero-conv-initialized.
        """
        params = self.init_params(key, num_points)
        fm = dict(params["fusion_model"]["params"])
        pc2_tree = pc2_params["point_cloud_model"]["params"]
        fm["pc2_encoder"] = pc2_tree["encoder"]
        fm["pvd_encoder"] = pvd_params["params"]["encoder"]
        fm["decoder"] = pc2_tree["decoder"]
        fm["embedf"] = pc2_tree["embedf"]
        params["fusion_model"] = {"params": fm}
        params["feature_model"] = pc2_params["feature_model"]
        return params

    # ------------------------------------------------------------- training
    def loss(self, params, batch: Dict[str, Any], key: jax.Array
             ) -> jnp.ndarray:
        """eps-MSE through the fusion net in 'fusion_1step' mode
        (`model.py:372-419`)."""
        cfg = self.cfg
        x0 = batch["points"] * cfg.scale_factor
        b = x0.shape[0]
        k_t, k_noise, k_drop = jax.random.split(key, 3)
        t = jax.random.randint(k_t, (b,), 0, self.num_train_timesteps)
        noise = jax.random.normal(k_noise, x0.shape, x0.dtype)
        sched = self.schedulers["ddpm"]
        x_t = sched.add_noise(x0, noise, t)
        cond_map = self.pc2.conditioning_map(
            params, batch["image"], batch.get("mask"),
            batch.get("distance_transform"))
        x_t_input = self.pc2.x_t_input(x_t, batch["camera"], cond_map)
        eps_pred = self.fusion.apply(
            params["fusion_model"], x_t_input, x_t, t, "fusion_1step",
            deterministic=False, rngs={"dropout": k_drop})
        return jnp.mean((eps_pred - noise) ** 2)

    # ------------------------------------------------------------- sampling
    def sample(self, params, batch: Dict[str, Any], key: jax.Array,
               num_points: int, scheduler: str = "ddpm",
               num_inference_steps: int = 1000) -> jnp.ndarray:
        """Full reverse loop through the fusion net alone in 'fusion_1step'
        mode (`model.py:421-508`), as one jitted scan."""
        sched = self.schedulers[scheduler]
        timesteps = sched.set_timesteps(num_inference_steps)
        b = batch["image"].shape[0]
        k_init, k_loop = jax.random.split(key)
        x = jax.random.normal(k_init, (b, num_points, 3), jnp.float32)
        cond_map = self.pc2.conditioning_map(
            params, batch["image"], batch.get("mask"),
            batch.get("distance_transform"))
        ts = jnp.asarray(list(timesteps), dtype=jnp.int32)
        keys = jax.random.split(k_loop, len(timesteps))
        out = _jitted_fusion_sample_scan(
            self, scheduler, sched.step_ratio, params, x, batch["camera"],
            cond_map, ts, keys)
        return out / self.cfg.scale_factor

    def nstep_fuse(self, params, pred_from_prior: jnp.ndarray,
                   pred_from_recon: jnp.ndarray, batch: Dict[str, Any],
                   key: jax.Array, timestep: int, scheduler: str = "ddpm",
                   num_inference_steps: int = 1000,
                   cond_map: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Fuse the two branch outputs at `timestep` (`model.py:510-570`)."""
        sched = self.schedulers[scheduler]
        sched.set_timesteps(num_inference_steps)
        prior = pred_from_prior - pred_from_prior.mean(axis=1, keepdims=True)
        recon = pred_from_recon - pred_from_recon.mean(axis=1, keepdims=True)
        if cond_map is None:
            cond_map = self.pc2.conditioning_map(
                params, batch["image"], batch.get("mask"),
                batch.get("distance_transform"))
        t = jnp.asarray(timestep, dtype=jnp.int32)
        return _jitted_nstep_fuse(self, scheduler, sched.step_ratio, params,
                                  prior, recon, batch["camera"], cond_map,
                                  t, key)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _jitted_fusion_sample_scan(merge: BDMMergingModel, scheduler_name: str,
                               step_ratio: int, params, x, camera, cond_map,
                               ts, keys):
    sched = merge.schedulers[scheduler_name]
    b = x.shape[0]

    def body(x, inp):
        t_scalar, k = inp
        x_in = merge.pc2.x_t_input(x, camera, cond_map)
        tb = jnp.full((b,), t_scalar, dtype=jnp.int32)
        eps = merge.fusion.apply(params["fusion_model"], x_in, x, tb,
                                 "fusion_1step", deterministic=True)
        if scheduler_name == "ddim":
            return sched.step(eps, t_scalar, x, key=k), None
        return sched.step(eps, t_scalar, x, k), None

    out, _ = jax.lax.scan(body, x, (ts, keys))
    return out


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _jitted_nstep_fuse(merge: BDMMergingModel, scheduler_name: str,
                       step_ratio: int, params, prior, recon, camera,
                       cond_map, t, key):
    """One compiled fusion step; `t` is traced so every milestone reuses the
    same executable."""
    sched = merge.schedulers[scheduler_name]
    b = recon.shape[0]
    x_in = merge.pc2.x_t_input(recon, camera, cond_map)
    tb = jnp.full((b,), t, dtype=jnp.int32)
    eps = merge.fusion.apply(params["fusion_model"], x_in, prior, tb,
                             "fusion_nstep", deterministic=True)
    if scheduler_name == "ddim":
        return sched.step(eps, t, recon, key=key)
    return sched.step(eps, t, recon, key)


def bdm_merging(merge_model: BDMMergingModel, merge_params,
                pc2: PC2Model, pc2_params, pvd: PVDModel, pvd_params,
                batch: Dict[str, Any], key: jax.Array, num_points: int,
                milestones: Sequence[int], roll_step: int,
                scheduler: str = "ddpm",
                num_inference_steps: int = 1000) -> jnp.ndarray:
    """The coupled merging sampler (`main_merging.py:369-523`)."""
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
    x = x - x.mean(axis=1, keepdims=True)

    cond_map = pc2.conditioning_map(
        pc2_params, batch["image"], batch.get("mask"),
        batch.get("distance_transform"))
    # pc2 windows use the pre-contracted fast path; the fusion net's
    # x_t_input needs the RAW map
    cond_pc2 = pc2.maybe_precontract(pc2_params, cond_map)

    def recon(x, start, end, k):
        return pc2.interaction_sample(
            pc2_params, x, batch, k, start_time=start, end_time=end,
            scheduler=scheduler, num_inference_steps=num_inference_steps,
            cond_map=cond_pc2)

    for i in range(times):
        k_seg, k_r, k_p, k_f, key = jax.random.split(key, 5)
        if i == 0:
            x = recon(x, milestones[i], milestones[i + 1] - roll_step, k_seg)
        elif i == times - 1:
            x = recon(x, milestones[i] - roll_step, milestones[i + 1], k_seg)
        else:
            x = recon(x, milestones[i] - roll_step, milestones[i + 1], k_seg)
            if scheduler == "ddpm":
                from bdm_tpu.samplers.blending import fused_branch_rolls
                out_recon, out_prior = fused_branch_rolls(
                    pc2, pc2_params, pvd, pvd_params, x, batch["camera"],
                    cond_pc2, milestones[i + 1],
                    milestones[i + 1] - roll_step + 1,
                    prior_milestones[i + 1],
                    prior_milestones[i + 1] - prior_roll_step + 1, k_r, k_p,
                    num_inference_steps)
            else:
                out_recon = recon(x, milestones[i + 1],
                                  milestones[i + 1] - roll_step + 1, k_r)
                out_prior = pvd.generate_window(
                    pvd_params, x, prior_milestones[i + 1],
                    prior_milestones[i + 1] - prior_roll_step + 1, k_p)

            x = merge_model.nstep_fuse(
                merge_params, out_prior, out_recon, batch, k_f,
                timestep=milestones[i + 1] - roll_step, scheduler=scheduler,
                num_inference_steps=num_inference_steps, cond_map=cond_map)
    return x
