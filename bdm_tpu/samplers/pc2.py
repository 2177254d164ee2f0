"""PC2: the projection-conditioned point-cloud diffusion model.

Functional rebuild of `ConditionalPointCloudDiffusionModel`
(`model/model.py:23-317`) + `PointCloudProjectionModel`
(`model/projection_model.py:19-231`).

Key TPU improvement over the reference: the image conditioning map (colors
+ ViT features [+ mask/distance transform]) is computed ONCE per sample and
closed over by the sampling scan; the reference re-runs its ViT at every
one of the 1000 denoising steps (SURVEY.md section 3 hot-loop note). Only the
point-dependent surface projection runs inside the scan.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from bdm_tpu.conditioning.cameras import PerspectiveCamera
from bdm_tpu.conditioning.projection import surface_projection
from bdm_tpu.diffusion import make_scheduler
from bdm_tpu.models.feature_model import FeatureModel
from bdm_tpu.models.pvcnn import PVCNN2


def compute_dtype_of(mixed_precision: str):
    """Map a `run.mixed_precision` string to a compute dtype (None = f32).

    "fp16" maps to bf16: the reference's accelerate default is fp16
    autocast, but fp16 has no TPU fast path and bf16 needs no loss
    scaling — same intent, TPU-native realization."""
    mp = (mixed_precision or "no").lower()
    if mp in ("no", "none", "fp32", "f32", "float32"):
        return None
    if mp in ("bf16", "bfloat16", "fp16", "float16"):
        return jnp.bfloat16
    raise ValueError(f"Unknown mixed_precision: {mixed_precision!r} "
                     "(choices: no, bf16, fp16)")


@dataclasses.dataclass(frozen=True)
class ProjectionConfig:
    """Mirrors `PointCloudProjectionModelConfig` (`config/structured.py:74-98`,
    defaults `projection_model.py:21-42`)."""

    image_size: int = 224
    image_feature_model: str = "vit_small_patch16_224_msn"
    use_local_colors: bool = True
    use_local_features: bool = True
    use_global_features: bool = False
    use_mask: bool = False
    use_distance_transform: bool = False
    predict_shape: bool = True
    predict_color: bool = False
    process_color: bool = False
    image_color_channels: int = 3
    color_channels: int = 3
    colors_mean: float = 0.5
    colors_std: float = 0.5
    scale_factor: float = 1.0
    raster_point_radius: float = 0.0075
    raster_points_per_pixel: int = 1
    # "multi" = exact PyTorch3D candidate set (every center within radius);
    # "nearest" = single nearest-center approximation (round-1 behavior,
    # kept for A/B measurement — see ARCHITECTURE.md)
    raster_splat: str = "multi"

    # diffusion (`PointCloudDiffusionModelConfig`, structured.py:102-111)
    beta_start: float = 1e-5
    beta_end: float = 8e-3
    beta_schedule: str = "linear"
    point_cloud_model: str = "pvcnn"
    point_cloud_model_embed_dim: int = 64

    # mixed precision (`run.mixed_precision`; the reference trains/samples
    # under fp16 autocast by default — `main.py:44` accelerator). The
    # TPU-native equivalent is a bf16 compute dtype with f32 parameters,
    # f32 geometry/softmax/GN-stats and an f32 classifier head. "fp16"
    # is accepted as an alias for bf16 (fp16 has no TPU fast path).
    mixed_precision: str = "no"

    # Pre-contract the conditioning map with the stage-0 conv's tap
    # weights once per sample (bdm_tpu extension, exact up to float
    # reassociation): the surface projection is linear in the map and the
    # scatter-mean + conv-tap reduction is linear per point, so the
    # per-step 390-wide voxelize+conv collapses to a tap scatter + shift
    # sum. Applies to pvcnn sampling paths; training keeps the reference
    # data flow. Default OFF: the r3 TPU A/B measured the tap-scatter
    # consumer chain at 42.4 ms/step vs 39.0 for the direct
    # segsum + Pallas matmul-first conv (XLA layout copies on the wide
    # (B,R,R,R,27*C0) grid eat the algebraic saving — see
    # ops/pallas/conv3d.py and the memory notes); kept as an option
    # because the balance may flip on other chip generations.
    precontract: bool = False


class PrecontractedCond(NamedTuple):
    """Per-sample pre-contracted conditioning (see
    ProjectionConfig.precontract). `comb_map` is
    [local conditioning | stage-0 conv tap contraction] per pixel, so ONE
    projection gather per step serves both the network input and the
    voxel-branch taps; `gtap` / `gfeats` carry the (per-point constant)
    global-feature contribution when use_global_features is on."""

    comb_map: jnp.ndarray                     # (B, H, W, L + 27*Cout0)
    gtap: Optional[jnp.ndarray]               # (B, 27*Cout0) or None
    gfeats: Optional[jnp.ndarray]             # (B, G) or None


class Conditioning(NamedTuple):
    """Image conditioning, computed once per image. `local_map` is the
    per-pixel map lifted onto points by surface projection; `global_feats`
    is the ViT CLS token appended to every point when
    `use_global_features` is on (`projection_model.py:102-108,222-228`).

    NOTE: the reference's global path cannot actually run — it calls its
    feature model with a nonexistent `return_cls_token_only` kwarg
    (`projection_model.py:105`), so enabling the flag crashes there. This
    implements the documented intent (CLS token broadcast per point); in
    'identity' feature mode (which has no CLS token) the global feature is
    the spatial mean of the image.
    """

    local_map: jnp.ndarray                    # (B, H, W, C_local)
    global_feats: Optional[jnp.ndarray]       # (B, D) or None


class PC2Model:
    """Bundles the ViT feature model, the PVCNN2 backbone and the
    schedulers. Parameters are an explicit dict:
        {"feature_model": <flax tree>, "point_cloud_model": <flax tree>}.
    """

    def __init__(self, cfg: ProjectionConfig = ProjectionConfig(),
                 sa_blocks=None, fp_blocks=None, sp_mesh=None,
                 sp_min_points: int = 2048):
        self.cfg = cfg
        self._sa_blocks = sa_blocks
        self._fp_blocks = fp_blocks
        # sequence-parallel backbone (SURVEY.md §2.7 large-N path): shard
        # the fine point levels over this mesh's "sp" axis — see
        # models/pvcnn.py::PVCNN2.sp_mesh
        self._sp_mesh = sp_mesh
        self._sp_min_points = sp_min_points
        self.feature_model = FeatureModel(image_size=cfg.image_size,
                                          model_name=cfg.image_feature_model)
        # input channel accounting (`projection_model.py:66-78`)
        in_channels = 3
        if cfg.use_local_colors:
            in_channels += cfg.image_color_channels
        if cfg.use_local_features:
            in_channels += self.feature_model.feature_dim
        if cfg.use_global_features:
            in_channels += self.feature_model.feature_dim
        if cfg.use_mask:
            in_channels += 2 if cfg.use_distance_transform else 1
        if cfg.process_color:
            in_channels += cfg.color_channels
        self.in_channels = in_channels
        self.out_channels = (3 if cfg.predict_shape else 0) + (
            cfg.color_channels if cfg.predict_color else 0)

        # backbone mux (`point_cloud_model.py:14-59`): pvcnn / simple /
        # pvcnnplusplus
        backbone_kwargs = {}
        if sa_blocks is not None:
            backbone_kwargs["sa_blocks"] = sa_blocks
        if fp_blocks is not None:
            backbone_kwargs["fp_blocks"] = fp_blocks
        self.compute_dtype = compute_dtype_of(cfg.mixed_precision)
        common = dict(out_channels=self.out_channels,
                      embed_dim=cfg.point_cloud_model_embed_dim,
                      extra_feature_channels=in_channels - 3,
                      dtype=self.compute_dtype)
        if cfg.point_cloud_model == "pvcnn":
            if sp_mesh is not None:
                backbone_kwargs.update(sp_mesh=sp_mesh,
                                       sp_min_points=sp_min_points)
            self.backbone = PVCNN2(**common, **backbone_kwargs)
        elif cfg.point_cloud_model == "simple":
            from bdm_tpu.models.simple import SimplePointModel
            self.backbone = SimplePointModel(**common)
        elif cfg.point_cloud_model == "pvcnnplusplus":
            from bdm_tpu.models.simple import PVCNN2PlusPlus
            self.backbone = PVCNN2PlusPlus(**common)
        else:
            raise NotImplementedError(cfg.point_cloud_model)
        self.schedulers = {
            name: make_scheduler(name, cfg.beta_start, cfg.beta_end,
                                 cfg.beta_schedule)
            for name in ("ddpm", "ddim", "pndm")
        }
        self.num_train_timesteps = self.schedulers["ddpm"].num_train_timesteps
        # width of the PROJECTED (local) conditioning channels in x_in:
        # [x_t(3) | local(L) | global(G)]
        self.local_cond_channels = self.in_channels - 3 - (
            self.feature_model.feature_dim if cfg.use_global_features
            else 0)
        self.precontract_enabled = (
            cfg.precontract and cfg.point_cloud_model == "pvcnn"
            and cfg.predict_shape and not cfg.predict_color
            and not cfg.process_color)

    def aot_static_key(self) -> str:
        """Stable description of everything static that shapes the traced
        graph (see utils/aot_cache.py)."""
        sp = ("" if self._sp_mesh is None
              else f"|sp{dict(self._sp_mesh.shape)!r}:{self._sp_min_points}")
        return (f"pc2|{self.cfg!r}|{self._sa_blocks!r}"
                f"|{self._fp_blocks!r}{sp}")

    # ------------------------------------------------------------------ init
    def init_params(self, key: jax.Array, num_points: int = 128
                    ) -> Dict[str, Any]:
        k1, k2 = jax.random.split(key)
        s = self.cfg.image_size
        feat_params = self.feature_model.init(
            k1, jnp.zeros((1, s, s, 3), jnp.float32))
        pc_params = self.backbone.init(
            k2, jnp.zeros((1, num_points, self.in_channels), jnp.float32),
            jnp.zeros((1,), jnp.int32))
        return {"feature_model": feat_params, "point_cloud_model": pc_params}

    # ---------------------------------------------------------- conditioning
    def conditioning_map(self, params, image: jnp.ndarray,
                         mask: Optional[jnp.ndarray] = None,
                         distance_transform: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
        """The per-pixel conditioning map, computed once per image
        (`projection_model.py:110-125`). image: (B, H, W, 3) in [0, 1].
        Jitted (nested jit is inlined when called from a jitted caller)."""
        return _jitted_conditioning_map(self, params, image, mask,
                                        distance_transform)

    def _conditioning_map_impl(self, params, image, mask,
                               distance_transform):
        cfg = self.cfg
        identity = cfg.image_feature_model == "identity"
        parts, gfeats = [], None
        if cfg.use_local_colors:
            parts.append((image - cfg.colors_mean) / cfg.colors_std)
        if cfg.use_local_features and cfg.use_global_features and not identity:
            # one ViT forward serves both (reference
            # `feature_model.py:100,127-132` return_type='all')
            gfeats, feats = self.feature_model.apply(
                params["feature_model"], image, return_type="all")
            parts.append(feats)
        elif cfg.use_local_features:
            parts.append(self.feature_model.apply(
                params["feature_model"], image))
        if cfg.use_mask:
            assert mask is not None
            parts.append(mask.astype(jnp.float32))
        if cfg.use_distance_transform:
            assert distance_transform is not None, (
                "distance transform is computed host-side (cv2) and passed "
                "in the batch")
            parts.append(distance_transform)
        if cfg.use_global_features and gfeats is None:
            if identity:
                gfeats = image.mean(axis=(1, 2))          # (B, 3)
            else:
                gfeats = self.feature_model.apply(
                    params["feature_model"], image, return_type="cls_token")
        local = jnp.concatenate(parts, axis=-1)
        if cfg.use_global_features:
            return Conditioning(local, gfeats)
        return local

    def _cast_cond_for_sampling(self, cond_map):
        """Store the local conditioning map in the compute dtype AND
        pre-flattened to (B, H*W, C) ONCE before a sampling scan. The map
        is loop-invariant, but XLA hoists neither the bf16 convert (a
        per-step (B, 224, 224, 387) cast+relayout copy, profiled
        0.115 ms/step) nor the flat-gather reshape (an ~86 us/step layout
        copy inside the while body) — `surface_projection` accepts the
        flat form directly. Global features stay f32 (they feed the f32
        network-input concat)."""
        dt = self.compute_dtype

        def prep(m):
            if m.ndim == 4:
                m = m.reshape(m.shape[0], -1, m.shape[-1])
            return m if dt is None else m.astype(dt)

        if isinstance(cond_map, PrecontractedCond):
            return cond_map._replace(comb_map=prep(cond_map.comb_map))
        if isinstance(cond_map, Conditioning):
            return Conditioning(prep(cond_map.local_map),
                                cond_map.global_feats)
        return prep(cond_map)

    # ------------------------------------------------------ precontraction
    def maybe_precontract(self, params, cond_map):
        """Wrap a conditioning map into a PrecontractedCond when the
        fast sampling path applies (no-op otherwise)."""
        if not self.precontract_enabled or isinstance(
                cond_map, PrecontractedCond):
            return self._cast_cond_for_sampling(cond_map)
        specs = self.backbone.specs()
        if not specs.sa_stages or not specs.sa_stages[0].convs:
            return self._cast_cond_for_sampling(cond_map)
        return self.precontract_cond(params, cond_map)

    def precontract_cond(self, params, cond_map) -> PrecontractedCond:
        """Contract the conditioning map with the stage-0 first conv's
        tap weights (rows 3:3+L of each of the 27 taps), once per sample.

        Exactness: surface projection is linear in the map (a weighted
        gather), scatter-mean is linear per point with a feature-free
        count, and the conv is a per-tap linear map — so
        conv(voxelize([x_t | proj(C)])) ==
        shift_sum(voxelize(x_t @ W_xt + proj(C @ W))) up to float
        reassociation. The contraction runs in HIGHEST precision since it
        is amortized over the whole trajectory."""
        if isinstance(cond_map, Conditioning):
            local_map, gfeats = cond_map.local_map, cond_map.global_feats
        else:
            local_map, gfeats = cond_map, None
        if local_map.ndim == 3:                       # pre-flattened form
            import math as _math
            s = _math.isqrt(local_map.shape[1])
            local_map = local_map.reshape(local_map.shape[0], s, s, -1)
        k = params["point_cloud_model"]["params"]["encoder"][
            "sa0_conv0"]["vconv0"]["kernel"]          # (3,3,3,Cin,Cout)
        cin, cout = k.shape[3], k.shape[4]
        length = local_map.shape[-1]
        wt = k.reshape(27, cin, cout)
        # tap-major (kd, kh, kw) C-order along the 27*Cout axis — the
        # layout VoxConv's x_t contraction and tap_shift_sum consume
        w_local = wt[:, 3:3 + length].transpose(1, 0, 2).reshape(
            length, 27 * cout)
        d_tap = jnp.einsum("bhwl,lt->bhwt", local_map, w_local,
                           precision=jax.lax.Precision.HIGHEST)
        store_dt = self.compute_dtype or jnp.float32
        comb = jnp.concatenate(
            [local_map.astype(store_dt), d_tap.astype(store_dt)], axis=-1)
        gtap = None
        if gfeats is not None:
            w_g = wt[:, 3 + length:].transpose(1, 0, 2).reshape(
                -1, 27 * cout)
            gtap = jnp.matmul(gfeats, w_g,
                              precision=jax.lax.Precision.HIGHEST
                              ).astype(store_dt)
            gfeats = gfeats.astype(store_dt)
        return self._cast_cond_for_sampling(
            PrecontractedCond(comb, gtap, gfeats))

    def _precontracted_input(self, x_t, camera, pre: PrecontractedCond):
        """-> (x_in (B,N,3+L[+G]), pre_tap (B,N,27*Cout0)): one combined
        projection gather serves the network input AND the voxel taps."""
        proj = surface_projection(
            x_t[..., :3], camera, pre.comb_map,
            radius=self.cfg.raster_point_radius,
            scale_factor=self.cfg.scale_factor,
            splat=self.cfg.raster_splat)
        length = self.local_cond_channels
        local, tap = proj[..., :length], proj[..., length:]
        if pre.gtap is not None:
            tap = tap + pre.gtap[:, None, :]
        parts = [x_t, local.astype(jnp.float32)]
        if pre.gfeats is not None:
            n = x_t.shape[1]
            parts.append(jnp.broadcast_to(
                pre.gfeats[:, None, :].astype(jnp.float32),
                (x_t.shape[0], n, pre.gfeats.shape[-1])))
        return jnp.concatenate(parts, axis=-1), tap

    def x_t_input(self, x_t: jnp.ndarray, camera: PerspectiveCamera,
                  cond_map) -> jnp.ndarray:
        """Concat [x_t | projected local features | global features] per
        `get_input_with_conditioning` (`projection_model.py:179-231`).
        `cond_map` is either the bare local map or a `Conditioning`."""
        if isinstance(cond_map, PrecontractedCond):
            raise TypeError(
                "x_t_input needs the raw conditioning map; a "
                "PrecontractedCond only serves PC2Model.denoise")
        if isinstance(cond_map, Conditioning):
            local_map, gfeats = cond_map.local_map, cond_map.global_feats
        else:
            local_map, gfeats = cond_map, None
        proj = surface_projection(
            x_t[..., :3], camera, local_map,
            radius=self.cfg.raster_point_radius,
            scale_factor=self.cfg.scale_factor,
            splat=self.cfg.raster_splat)
        parts = [x_t, proj]
        if gfeats is not None:
            n = x_t.shape[1]
            parts.append(jnp.broadcast_to(
                gfeats[:, None, :], (gfeats.shape[0], n, gfeats.shape[-1])))
        return jnp.concatenate(parts, axis=-1)

    def denoise(self, params, x_t, t, camera, cond_map,
                deterministic: bool = True, rngs=None) -> jnp.ndarray:
        """One eps prediction. t: (B,) int32. `cond_map` may be the raw
        per-pixel map, a Conditioning, or a PrecontractedCond (fast
        sampling path)."""
        if isinstance(cond_map, PrecontractedCond):
            x_in, tap = self._precontracted_input(x_t, camera, cond_map)
            return self.backbone.apply(
                params["point_cloud_model"], x_in, t,
                deterministic=deterministic, rngs=rngs, pre_tap=tap)
        x_in = self.x_t_input(x_t, camera, cond_map)
        return self.backbone.apply(params["point_cloud_model"], x_in, t,
                                   deterministic=deterministic, rngs=rngs)

    # -------------------------------------------------------------- training
    def loss(self, params, batch: Dict[str, Any], key: jax.Array
             ) -> jnp.ndarray:
        """eps-MSE training loss (`model.py:75-121`)."""
        cfg = self.cfg
        x0 = batch["points"] * cfg.scale_factor
        b = x0.shape[0]
        k_t, k_noise, k_drop = jax.random.split(key, 3)
        t = jax.random.randint(k_t, (b,), 0, self.num_train_timesteps)
        noise = jax.random.normal(k_noise, x0.shape, x0.dtype)
        sched = self.schedulers["ddpm"]
        x_t = sched.add_noise(x0, noise, t)
        cond_map = self.conditioning_map(
            params, batch["image"], batch.get("mask"),
            batch.get("distance_transform"))
        eps_pred = self.denoise(params, x_t, t, batch["camera"], cond_map,
                                deterministic=False,
                                rngs={"dropout": k_drop})
        return jnp.mean((eps_pred - noise) ** 2)

    # -------------------------------------------------------------- sampling
    def _window_scan(self, params, x_t, camera, cond_map, timesteps,
                     scheduler, key, eta: float = 0.0,
                     scheduler_name: str = "ddpm") -> jnp.ndarray:
        """Scan the reverse process over a window of timesteps.

        The timestep array is a TRACED input of one jitted scan, so the
        executable is cached by window LENGTH. To collapse the ~3 distinct
        BDM window lengths onto ONE executable, the window is chunked into
        gcd(len, 16)-step scans (16 = the canonical roll_step; all
        canonical milestone windows are multiples of 8) — compile time is
        paid once, the extra host dispatches pipeline asynchronously.
        """
        n_steps = len(timesteps)
        if n_steps == 0:
            return x_t
        import math as _math
        chunk = _math.gcd(n_steps, 16)
        if chunk == 1 and n_steps > 1:
            # a window length coprime with 16 would degenerate to 1-step
            # scans (hundreds of host dispatches); one full-length scan
            # costs one extra compile instead
            chunk = n_steps
        if chunk != 16 and chunk != n_steps:
            import logging
            logging.getLogger(__name__).debug(
                "window scan: %d steps in chunks of %d", n_steps, chunk)
        keys = jax.random.split(key, n_steps)
        from bdm_tpu.utils.aot_cache import aot_call
        skey = (f"{self.aot_static_key()}|{scheduler_name}|{eta}|"
                f"{scheduler.step_ratio}")
        for i in range(0, n_steps, chunk):
            ts = jnp.asarray(timesteps[i:i + chunk], dtype=jnp.int32)
            x_t = aot_call(
                _jitted_window_scan,
                (self, scheduler_name, float(eta), scheduler.step_ratio),
                (params, x_t, camera, cond_map, ts, keys[i:i + chunk]),
                tag="pc2-window", static_key=skey)
        return x_t

    def sample(self, params, batch: Dict[str, Any], key: jax.Array,
               num_points: int, scheduler: str = "ddpm",
               num_inference_steps: int = 1000, eta: float = 0.0,
               return_sample_every_n_steps: int = -1):
        """Full reverse loop from N(0, I) (`model.py:123-214`).
        Returns (B, N, 3) points (unscaled); with
        `return_sample_every_n_steps > 0` also returns the stacked
        intermediate clouds (B, S, N, 3) like the reference's evolutions.
        """
        sched = self.schedulers[scheduler]
        timesteps = sched.set_timesteps(num_inference_steps)
        b = batch["image"].shape[0]
        k_init, k_loop = jax.random.split(key)
        x_t = jax.random.normal(k_init, (b, num_points, 3), jnp.float32)
        cond_map = self.conditioning_map(
            params, batch["image"], batch.get("mask"),
            batch.get("distance_transform"))
        cond_map = self.maybe_precontract(params, cond_map)
        if scheduler == "pndm":
            # PNDM carries multistep state across the whole trajectory, so
            # it only supports the full reverse loop (the reference never
            # composes it with BDM windows either).
            if return_sample_every_n_steps > 0:
                raise NotImplementedError(
                    "evolutions are not supported with the pndm scheduler")
            out = _jitted_pndm_scan(self, params, x_t, batch["camera"],
                                    cond_map,
                                    jnp.asarray(timesteps, jnp.int32))
            return out / self.cfg.scale_factor
        if return_sample_every_n_steps <= 0:
            out = self._window_scan(params, x_t, batch["camera"], cond_map,
                                    list(timesteps), sched, k_loop, eta,
                                    scheduler_name=scheduler)
            return out / self.cfg.scale_factor
        # evolutions: run per-segment and stash snapshots (host-side stack)
        snaps = []
        ts = list(timesteps)
        n_steps = len(ts)
        for i in range(0, n_steps, return_sample_every_n_steps):
            seg = ts[i:i + return_sample_every_n_steps]
            k_loop, sub = jax.random.split(k_loop)
            x_t = self._window_scan(params, x_t, batch["camera"], cond_map,
                                    seg, sched, sub, eta,
                                    scheduler_name=scheduler)
            snaps.append(x_t)
        out = x_t / self.cfg.scale_factor
        evo = jnp.stack(snaps, axis=1) / self.cfg.scale_factor
        return out, evo

    def interaction_sample(self, params, x_t: jnp.ndarray,
                           batch: Dict[str, Any], key: jax.Array,
                           start_time: int, end_time: int,
                           scheduler: str = "ddpm",
                           num_inference_steps: int = 1000,
                           eta: float = 0.0,
                           cond_map: Optional[jnp.ndarray] = None,
                           return_sample_every_n_steps: int = -1
                           ) -> jnp.ndarray:
        """Partial reverse window over timesteps[S-start : S-end], given an
        x_t (`model.py:216-291`). start/end are static ints.

        `return_sample_every_n_steps` is accepted for API parity: the
        reference declares it (`model.py:230`) and the blending CLI passes
        it (`main_blending.py:244`), but the reference's loop never
        collects snapshots — the final cloud alone is returned. Replicated
        exactly (a silent no-op)."""
        del return_sample_every_n_steps  # accepted-but-unused, like model.py
        if scheduler == "pndm":
            raise ValueError(
                "pndm carries multistep state across the whole trajectory "
                "and cannot be windowed; the reference never composes it "
                "with BDM either. Use scheduler='ddpm' or 'ddim'.")
        sched = self.schedulers[scheduler]
        timesteps = sched.set_timesteps(num_inference_steps)
        window = list(timesteps[num_inference_steps - start_time:
                                num_inference_steps - end_time])
        if cond_map is None:
            cond_map = self.conditioning_map(
                params, batch["image"], batch.get("mask"),
                batch.get("distance_transform"))
        cond_map = self.maybe_precontract(params, cond_map)
        return self._window_scan(params, x_t, batch["camera"], cond_map,
                                 window, sched, key, eta,
                                 scheduler_name=scheduler)


@functools.partial(jax.jit, static_argnums=(0,))
def _jitted_conditioning_map(pc2: "PC2Model", params, image, mask,
                             distance_transform):
    return pc2._conditioning_map_impl(params, image, mask,
                                      distance_transform)


@functools.partial(jax.jit, static_argnums=(0,))
def _jitted_pndm_scan(pc2: "PC2Model", params, x_t, camera, cond_map,
                      ts) -> jnp.ndarray:
    """Full PNDM reverse loop: a scan carrying (x, PNDMState)."""
    sched = pc2.schedulers["pndm"]
    b = x_t.shape[0]

    def body(carry, t_scalar):
        x, st = carry
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        eps = pc2.denoise(params, x, t, camera, cond_map)
        x, st = sched.step(eps, t_scalar, x, st)
        return (x, st), None

    (out, _), _ = jax.lax.scan(body, (x_t, sched.init_state(x_t.shape)), ts)
    return out


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _jitted_window_scan(pc2: PC2Model, scheduler_name: str, eta: float,
                        step_ratio: int, params, x_t, camera, cond_map,
                        ts, keys) -> jnp.ndarray:
    """One compiled reverse-window scan, cached per (model, scheduler,
    window length). `step_ratio` is part of the static key because the
    scheduler's stride is read at trace time."""
    sched = pc2.schedulers[scheduler_name]
    b = x_t.shape[0]

    def body(x, inp):
        t_scalar, k = inp
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        eps = pc2.denoise(params, x, t, camera, cond_map)
        if scheduler_name == "ddim":
            x = sched.step(eps, t_scalar, x, key=k, eta=eta)
        else:
            x = sched.step(eps, t_scalar, x, k)
        return x, None

    out, _ = jax.lax.scan(body, x_t, (ts, keys))
    return out
