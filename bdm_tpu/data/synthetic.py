"""Synthetic dataset: random clouds/images/cameras with the same sample
schema as the real loaders — for tests, benchmarks, and smoke-training
without ShapeNet on disk."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from bdm_tpu.conditioning.cameras import PerspectiveCamera


class SyntheticDataset:
    def __init__(self, num_samples: int = 64, max_points: int = 4096,
                 image_size: int = 224, seed: int = 0):
        self.num_samples = num_samples
        self.max_points = max_points
        self.image_size = image_size
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        s = self.image_size
        camera = PerspectiveCamera(
            R=jnp.eye(3)[None],
            T=jnp.asarray([[0.0, 0.0, 1.5]]),
            focal_length=jnp.full((1, 2), 2.1875),
            principal_point=jnp.zeros((1, 2)),
        )
        return {
            "points": rng.standard_normal(
                (self.max_points, 3)).astype(np.float32) * 0.3,
            "image": rng.uniform(0, 1, (s, s, 3)).astype(np.float32),
            "camera": camera,
            "sequence_name": f"synthetic_{idx:05d}",
            "sequence_category": "synthetic",
        }
