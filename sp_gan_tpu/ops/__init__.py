"""Pure-function kernel layer.

TPU-native replacements for the reference's CUDA extensions under
`/root/reference/metrics/` and the pure-torch graph ops in
`/root/reference/Generation/modules.py:629-776`. Every op is a jittable pure
function over channel-last arrays; hot ops additionally ship a Pallas-tiled
implementation selected via `sp_gan_tpu.ops.dispatch`.
"""

from sp_gan_tpu.ops.pairwise import pairwise_sqdist, knn_indices
from sp_gan_tpu.ops.edge import edge_features, gather_neighbors
from sp_gan_tpu.ops.chamfer import chamfer, chamfer_sums, nn_distance
from sp_gan_tpu.ops.emd import emd_auction, emd_cost
from sp_gan_tpu.ops.sampling import (
    farthest_point_sample,
    gather_points,
    ball_query,
    three_nn,
    three_interpolate,
    minimum_density_sample,
)
from sp_gan_tpu.ops.grouping import knn_query, group_points, query_and_group
from sp_gan_tpu.ops.expansion import expansion_penalty
from sp_gan_tpu.ops.voxel import voxel_occupancy

__all__ = [
    "pairwise_sqdist", "knn_indices",
    "edge_features", "gather_neighbors",
    "chamfer", "chamfer_sums", "nn_distance",
    "emd_auction", "emd_cost",
    "farthest_point_sample", "gather_points", "ball_query",
    "three_nn", "three_interpolate", "minimum_density_sample",
    "knn_query", "group_points", "query_and_group",
    "expansion_penalty",
    "voxel_occupancy",
]
