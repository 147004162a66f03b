"""Visualization + point-cloud file IO (reference:
`/root/reference/Common/visu_utils.py`, `Common/pc_util.py`)."""

from sp_gan_tpu.viz.plot import (
    plot_grid,
    plot_three_views,
    plot_three_views_color,
    point_cloud_three_views,
    draw_point_cloud,
)
from sp_gan_tpu.viz.io import save_xyz, load_xyz, save_ply, load_ply, load_pcd

__all__ = [
    "plot_grid", "plot_three_views", "plot_three_views_color",
    "point_cloud_three_views", "draw_point_cloud",
    "save_xyz", "load_xyz", "save_ply", "load_ply", "load_pcd",
]
