"""Pallas TPU kernels for the latency-critical point ops.

The pure-JAX ops in `bdm_tpu.ops` are the reference implementations; these
kernels are drop-in replacements chosen when they win on hardware. The
selection is runtime-gated (TPU backend + supported shapes) with automatic
fallback.
"""

from bdm_tpu.ops.pallas.fps import furthest_point_sample_pallas
from bdm_tpu.ops.pallas.ball_query import ball_query_pallas
from bdm_tpu.ops.pallas.three_nn import three_nn_pallas

__all__ = ["furthest_point_sample_pallas", "ball_query_pallas",
           "three_nn_pallas"]
