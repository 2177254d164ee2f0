"""Evaluation: batched on-device Chamfer / F-score.

Rebuilds `experiments/evaluation/evaluation_cd.py` and `evaluation_f1.py`
as jittable batched metrics plus a directory-walking CLI
(`bdm_tpu.evaluation.cli`).
"""

from bdm_tpu.evaluation.metrics import (
    chamfer_distance,
    fscore,
    pairwise_min_sqdist,
)

__all__ = ["chamfer_distance", "fscore", "pairwise_min_sqdist"]
