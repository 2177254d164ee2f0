"""Multi-stream BDM-Blending: S independent sampling problems advanced in
ONE program per window.

Why: the profiled production step is latency-bound on a serial chain of
~100 sub-0.2 ms fusions (gathers, GN stats, pads, scheduler math) that a
bigger batch does NOT amortize — batch widening grows every op but leaves
the dependency chain length unchanged. Graph DUPLICATION does amortize it:
S structurally-independent denoise chains in one scan body let XLA's
latency-hiding scheduler fill one stream's gather/scatter latency gaps
with another stream's compute. This generalizes round 3's proven
`_jitted_fused_rolls` pattern (recon+prior interleave at milestones,
blending.py:38-72) from the ~160 milestone evals to the WHOLE trajectory.

Semantics: stream s is bit-identical to `bdm_blending(batch_s, key_s)` —
same key splits, same milestone control flow (`main_blending.py:186-347`);
only the execution schedule changes (tested: tests/test_multistream.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from bdm_tpu.samplers.blending import blend_point_clouds
from bdm_tpu.samplers.pc2 import PC2Model
from bdm_tpu.samplers.pvd import PVDModel
from bdm_tpu.utils.compile_cache import no_persistent_cache

# Every compile below runs under no_persistent_cache(): the S-duplicated
# executables are the largest programs in the package and XLA:CPU's
# executable serializer segfaulted deterministically writing the merging
# one to the persistent cache mid-suite (jax 0.9.0
# compilation_cache.py:265 executable.serialize()). The guard is a no-op
# on TPU, where these executables cache normally.


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _jitted_window_scan_multi(pc2: PC2Model, scheduler_name: str,
                              eta: float, step_ratio: int, params, xs,
                              cameras, cond_maps, ts, keys):
    """One reverse-window scan advancing S independent streams.

    xs/cameras/cond_maps: S-tuples; keys: (n_steps, S) PRNG keys. The
    Python loop over streams inside the scan body is deliberate — it
    duplicates the denoise graph so the chains stay independent (a vmap
    or batch-concat would instead widen each op, keeping the serial
    chain length)."""
    sched = pc2.schedulers[scheduler_name]

    def body(carry, inp):
        t_scalar, ks = inp
        out = []
        for s, x in enumerate(carry):
            t = jnp.full((x.shape[0],), t_scalar, dtype=jnp.int32)
            eps = pc2.denoise(params, x, t, cameras[s], cond_maps[s])
            if scheduler_name == "ddim":
                out.append(sched.step(eps, t_scalar, x, key=ks[s],
                                      eta=eta))
            else:
                out.append(sched.step(eps, t_scalar, x, ks[s]))
        return tuple(out), None

    out, _ = jax.lax.scan(body, tuple(xs), (ts, keys))
    return out


@functools.partial(jax.jit, static_argnums=(0, 1))
def _jitted_fused_rolls_multi(pc2: PC2Model, pvd: PVDModel, pc2_params,
                              pvd_params, xs, cameras, cond_maps,
                              ts_recon, ts_prior, keys_r, keys_p):
    """All 2*S milestone branch rolls (S recon + S prior) in one
    executable — the multi-stream form of `_jitted_fused_rolls`."""
    sched = pc2.schedulers["ddpm"]
    denoise_p = pvd.denoise_fn(pvd_params)
    n = len(xs)

    def body(carry, inp):
        t_r, t_p, k_r, k_p = inp
        xrs, xps = carry[:n], carry[n:]
        new_r, new_p = [], []
        for s in range(n):
            b = xrs[s].shape[0]
            eps = pc2.denoise(pc2_params, xrs[s],
                              jnp.full((b,), t_r, dtype=jnp.int32),
                              cameras[s], cond_maps[s])
            new_r.append(sched.step(eps, t_r, xrs[s], k_r[s]))
            new_p.append(pvd.diffusion.p_sample(
                denoise_p, xps[s], jnp.full((b,), t_p, dtype=jnp.int32),
                k_p[s], clip_denoised=False))
        return tuple(new_r) + tuple(new_p), None

    carry, _ = jax.lax.scan(body, tuple(xs) + tuple(xs),
                            (ts_recon, ts_prior, keys_r, keys_p))
    return carry[:n], carry[n:]


def _window_scan_multi(pc2: PC2Model, params, xs, cameras, cond_maps,
                       timesteps, scheduler, keys_seg,
                       scheduler_name: str = "ddpm", eta: float = 0.0):
    """Chunked multi-stream window scan (mirrors PC2Model._window_scan's
    gcd-chunk caching: per-stream keys split exactly like the single
    path so each stream's trajectory is bit-identical)."""
    n_steps = len(timesteps)
    if n_steps == 0:
        return xs
    import math as _math
    chunk = _math.gcd(n_steps, 16)
    if chunk == 1 and n_steps > 1:
        chunk = n_steps
    keys = jnp.stack([jax.random.split(k, n_steps) for k in keys_seg],
                     axis=1)                           # (n_steps, S)
    from bdm_tpu.utils.aot_cache import aot_call
    skey = (f"{pc2.aot_static_key()}|{scheduler_name}|{eta}|"
            f"{scheduler.step_ratio}|S{len(xs)}")
    for i in range(0, n_steps, chunk):
        ts = jnp.asarray(timesteps[i:i + chunk], dtype=jnp.int32)
        with no_persistent_cache():
            xs = aot_call(
                _jitted_window_scan_multi,
                (pc2, scheduler_name, float(eta), scheduler.step_ratio),
                (params, tuple(xs), tuple(cameras), tuple(cond_maps), ts,
                 keys[i:i + chunk]),
                tag="pc2-window-multi", static_key=skey)
    return list(xs)


def bdm_blending_multi(pc2: PC2Model, pc2_params, pvd: PVDModel,
                       pvd_params, batches: Sequence[Dict[str, Any]],
                       keys: Sequence[jax.Array], num_points: int,
                       milestones: Sequence[int], roll_step: int,
                       scheduler: str = "ddpm",
                       num_inference_steps: int = 1000
                       ) -> List[jnp.ndarray]:
    """Run S coupled blending samplers concurrently; returns a list of
    (B, N, 3) clouds, stream s bit-identical to
    `bdm_blending(..., batches[s], keys[s], ...)`. DDPM only (the DDIM
    milestone mapping gives the branches unequal window lengths)."""
    assert scheduler == "ddpm", "multi-stream supports ddpm only"
    milestones = [int(m) for m in milestones]
    times = len(milestones) - 1
    prior_roll_step = roll_step
    prior_milestones = milestones
    sched = pc2.schedulers["ddpm"]
    timesteps = sched.set_timesteps(num_inference_steps)
    s_count = len(batches)
    assert len(keys) == s_count

    xs, cond_maps, cameras, key_states = [], [], [], []
    for batch, key in zip(batches, keys):
        b = batch["image"].shape[0]
        k_init, key = jax.random.split(key)
        x = jax.random.normal(k_init, (b, num_points, 3), jnp.float32)
        xs.append(x - x.mean(axis=1, keepdims=True))
        cm = pc2.conditioning_map(
            pc2_params, batch["image"], batch.get("mask"),
            batch.get("distance_transform"))
        cond_maps.append(pc2.maybe_precontract(pc2_params, cm))
        cameras.append(batch["camera"])
        key_states.append(key)

    def window(start, end):
        return list(timesteps[num_inference_steps - start:
                              num_inference_steps - end])

    for i in range(times):
        segs, krs, kps, kmixes = [], [], [], []
        for s in range(s_count):
            k_seg, k_r, k_p, k_mix, key_states[s] = jax.random.split(
                key_states[s], 5)
            segs.append(k_seg)
            krs.append(k_r)
            kps.append(k_p)
            kmixes.append(k_mix)
        if i == 0:
            xs = _window_scan_multi(
                pc2, pc2_params, xs, cameras, cond_maps,
                window(milestones[i], milestones[i + 1] - roll_step),
                sched, segs)
        elif i == times - 1:
            xs = _window_scan_multi(
                pc2, pc2_params, xs, cameras, cond_maps,
                window(milestones[i] - roll_step, milestones[i + 1]),
                sched, segs)
        else:
            xs = _window_scan_multi(
                pc2, pc2_params, xs, cameras, cond_maps,
                window(milestones[i] - roll_step, milestones[i + 1]),
                sched, segs)
            ts_recon = jnp.asarray(
                window(milestones[i + 1], milestones[i + 1] - roll_step),
                jnp.int32)
            ts_prior = jnp.arange(
                prior_milestones[i + 1] - 1,
                prior_milestones[i + 1] - prior_roll_step - 1, -1,
                dtype=jnp.int32)
            steps = len(ts_recon)
            assert steps == len(ts_prior), (steps, len(ts_prior))
            keys_r = jnp.stack([jax.random.split(k, steps) for k in krs],
                               axis=1)
            keys_p = jnp.stack([jax.random.split(k, steps) for k in kps],
                               axis=1)
            from bdm_tpu.utils.aot_cache import aot_call
            with no_persistent_cache():
                out_r, out_p = aot_call(
                    _jitted_fused_rolls_multi, (pc2, pvd),
                    (pc2_params, pvd_params, tuple(xs), tuple(cameras),
                     tuple(cond_maps), ts_recon, ts_prior, keys_r, keys_p),
                    tag="bdm-fused-rolls-multi",
                    static_key=(f"{pc2.aot_static_key()}&"
                                f"{pvd.aot_static_key()}&S{s_count}"))
            xs = [blend_point_clouds(out_r[s], out_p[s], kmixes[s])
                  for s in range(s_count)]
    return xs


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _jitted_nstep_fuse_multi(merge, scheduler_name: str, step_ratio: int,
                             params, priors, recons, cameras, cond_maps,
                             t, keys):
    """S fusion-step forwards in one executable (multi-stream form of
    merging._jitted_nstep_fuse; `t` traced so milestones share it)."""
    sched = merge.schedulers[scheduler_name]
    outs = []
    for s in range(len(recons)):
        b = recons[s].shape[0]
        x_in = merge.pc2.x_t_input(recons[s], cameras[s], cond_maps[s])
        tb = jnp.full((b,), t, dtype=jnp.int32)
        eps = merge.fusion.apply(params["fusion_model"], x_in, priors[s],
                                 tb, "fusion_nstep", deterministic=True)
        if scheduler_name == "ddim":
            outs.append(sched.step(eps, t, recons[s], key=keys[s]))
        else:
            outs.append(sched.step(eps, t, recons[s], keys[s]))
    return tuple(outs)


def bdm_merging_multi(merge_model, merge_params, pc2: PC2Model, pc2_params,
                      pvd: PVDModel, pvd_params,
                      batches: Sequence[Dict[str, Any]],
                      keys: Sequence[jax.Array], num_points: int,
                      milestones: Sequence[int], roll_step: int,
                      scheduler: str = "ddpm",
                      num_inference_steps: int = 1000
                      ) -> List[jnp.ndarray]:
    """S coupled merging samplers concurrently; stream s bit-identical to
    `bdm_merging(..., batches[s], keys[s], ...)`. DDPM only."""
    assert scheduler == "ddpm", "multi-stream supports ddpm only"
    milestones = [int(m) for m in milestones]
    times = len(milestones) - 1
    prior_roll_step = roll_step
    prior_milestones = milestones
    sched = pc2.schedulers["ddpm"]
    timesteps = sched.set_timesteps(num_inference_steps)
    s_count = len(batches)
    assert len(keys) == s_count

    xs, cond_raw, cond_pc2, cameras, key_states = [], [], [], [], []
    for batch, key in zip(batches, keys):
        b = batch["image"].shape[0]
        k_init, key = jax.random.split(key)
        x = jax.random.normal(k_init, (b, num_points, 3), jnp.float32)
        xs.append(x - x.mean(axis=1, keepdims=True))
        cm = pc2.conditioning_map(
            pc2_params, batch["image"], batch.get("mask"),
            batch.get("distance_transform"))
        cond_raw.append(cm)
        cond_pc2.append(pc2.maybe_precontract(pc2_params, cm))
        cameras.append(batch["camera"])
        key_states.append(key)

    def window(start, end):
        return list(timesteps[num_inference_steps - start:
                              num_inference_steps - end])

    for i in range(times):
        segs, krs, kps, kfs = [], [], [], []
        for s in range(s_count):
            k_seg, k_r, k_p, k_f, key_states[s] = jax.random.split(
                key_states[s], 5)
            segs.append(k_seg)
            krs.append(k_r)
            kps.append(k_p)
            kfs.append(k_f)
        if i == 0:
            xs = _window_scan_multi(
                pc2, pc2_params, xs, cameras, cond_pc2,
                window(milestones[i], milestones[i + 1] - roll_step),
                sched, segs)
        elif i == times - 1:
            xs = _window_scan_multi(
                pc2, pc2_params, xs, cameras, cond_pc2,
                window(milestones[i] - roll_step, milestones[i + 1]),
                sched, segs)
        else:
            xs = _window_scan_multi(
                pc2, pc2_params, xs, cameras, cond_pc2,
                window(milestones[i] - roll_step, milestones[i + 1]),
                sched, segs)
            # both branches roll to milestone - roll_step + 1
            # (`main_merging.py:487-503`)
            ts_recon = jnp.asarray(
                window(milestones[i + 1],
                       milestones[i + 1] - roll_step + 1), jnp.int32)
            ts_prior = jnp.arange(
                prior_milestones[i + 1] - 1,
                prior_milestones[i + 1] - prior_roll_step, -1,
                dtype=jnp.int32)
            steps = len(ts_recon)
            assert steps == len(ts_prior), (steps, len(ts_prior))
            keys_r = jnp.stack([jax.random.split(k, steps) for k in krs],
                               axis=1)
            keys_p = jnp.stack([jax.random.split(k, steps) for k in kps],
                               axis=1)
            from bdm_tpu.utils.aot_cache import aot_call
            with no_persistent_cache():
                out_r, out_p = aot_call(
                    _jitted_fused_rolls_multi, (pc2, pvd),
                    (pc2_params, pvd_params, tuple(xs), tuple(cameras),
                     tuple(cond_pc2), ts_recon, ts_prior, keys_r, keys_p),
                    tag="bdm-fused-rolls-multi",
                    static_key=(f"{pc2.aot_static_key()}&"
                                f"{pvd.aot_static_key()}&S{s_count}"))
            # recenter both branch outputs per stream (model.py:510-570)
            priors = [p - p.mean(axis=1, keepdims=True) for p in out_p]
            recons = [r - r.mean(axis=1, keepdims=True) for r in out_r]
            t = jnp.asarray(milestones[i + 1] - roll_step, dtype=jnp.int32)
            with no_persistent_cache():
                fused = _jitted_nstep_fuse_multi(
                    merge_model, scheduler, sched.step_ratio, merge_params,
                    tuple(priors), tuple(recons), tuple(cameras),
                    tuple(cond_raw), t, tuple(kfs))
            xs = list(fused)
    return xs
