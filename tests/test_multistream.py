"""Multi-stream blending must be bit-identical per stream to the
single-stream sampler — only the execution schedule may differ."""

import numpy as np

import jax

from bdm_tpu.samplers import PC2Model, ProjectionConfig, PVDModel, \
    bdm_blending, bdm_blending_multi
from tests.test_models import TINY_FP, TINY_SA


def _tiny_models():
    cfg = ProjectionConfig(image_size=16, image_feature_model="identity",
                           raster_point_radius=0.3,
                           point_cloud_model_embed_dim=8)
    pc2 = PC2Model(cfg, sa_blocks=TINY_SA, fp_blocks=TINY_FP)
    pvd = PVDModel(embed_dim=8, sa_blocks=TINY_SA, fp_blocks=TINY_FP)
    return pc2, pvd


def test_multistream_matches_single_stream():
    from __graft_entry__ import _synthetic_batch
    pc2, pvd = _tiny_models()
    pc2_params = pc2.init_params(jax.random.PRNGKey(0), num_points=64)
    pvd_params = pvd.init_params(jax.random.PRNGKey(1), num_points=64)

    milestones, roll, steps, n = [8, 6, 2, 0], 2, 8, 64
    batches = [_synthetic_batch(2, n, 16, np.random.default_rng(s))
               for s in range(2)]
    keys = [jax.random.PRNGKey(100 + s) for s in range(2)]

    singles = [
        np.asarray(bdm_blending(
            pc2, pc2_params, pvd, pvd_params, batches[s], keys[s],
            num_points=n, milestones=milestones, roll_step=roll,
            scheduler="ddpm", num_inference_steps=steps))
        for s in range(2)
    ]
    multi = bdm_blending_multi(
        pc2, pc2_params, pvd, pvd_params, batches, keys, num_points=n,
        milestones=milestones, roll_step=roll, scheduler="ddpm",
        num_inference_steps=steps)
    assert len(multi) == 2
    for s in range(2):
        np.testing.assert_array_equal(np.asarray(multi[s]), singles[s],
                                      err_msg=f"stream {s}")


def test_merging_multistream_matches_single_stream():
    from __graft_entry__ import _synthetic_batch
    from bdm_tpu.samplers import BDMMergingModel, bdm_merging, \
        bdm_merging_multi
    pc2, pvd = _tiny_models()
    pc2_params = pc2.init_params(jax.random.PRNGKey(0), num_points=64)
    pvd_params = pvd.init_params(jax.random.PRNGKey(1), num_points=64)
    merge = BDMMergingModel(pc2.cfg, pc2=pc2, sa_blocks=TINY_SA,
                            fp_blocks=TINY_FP)
    merge_params = merge.init_from_pretrained(
        jax.random.PRNGKey(2), pc2_params, pvd_params, num_points=64)

    milestones, roll, steps, n = [8, 6, 2, 0], 2, 8, 64
    batches = [_synthetic_batch(2, n, 16, np.random.default_rng(s))
               for s in range(2)]
    keys = [jax.random.PRNGKey(200 + s) for s in range(2)]

    singles = [
        np.asarray(bdm_merging(
            merge, merge_params, pc2, pc2_params, pvd, pvd_params,
            batches[s], keys[s], num_points=n, milestones=milestones,
            roll_step=roll, scheduler="ddpm", num_inference_steps=steps))
        for s in range(2)
    ]
    multi = bdm_merging_multi(
        merge, merge_params, pc2, pc2_params, pvd, pvd_params, batches,
        keys, num_points=n, milestones=milestones, roll_step=roll,
        scheduler="ddpm", num_inference_steps=steps)
    for s in range(2):
        np.testing.assert_array_equal(np.asarray(multi[s]), singles[s],
                                      err_msg=f"stream {s}")
