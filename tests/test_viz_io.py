"""Viz + IO tests: file roundtrips and renderer output sanity."""

import numpy as np
import pytest

from sp_gan_tpu.viz import (
    draw_point_cloud,
    load_ply,
    load_pcd,
    load_xyz,
    plot_grid,
    plot_three_views,
    point_cloud_three_views,
    save_ply,
    save_xyz,
)


@pytest.fixture
def cloud(rng):
    return rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32)


class TestIO:
    def test_xyz_roundtrip(self, tmp_path, cloud):
        p = str(tmp_path / "c.xyz")
        save_xyz(p, cloud)
        np.testing.assert_allclose(load_xyz(p), cloud, atol=1e-5)

    def test_ply_binary_roundtrip(self, tmp_path, cloud):
        p = str(tmp_path / "c.ply")
        save_ply(p, cloud, binary=True)
        np.testing.assert_allclose(load_ply(p), cloud, atol=1e-6)

    def test_ply_ascii_roundtrip(self, tmp_path, cloud):
        p = str(tmp_path / "c.ply")
        save_ply(p, cloud, binary=False)
        np.testing.assert_allclose(load_ply(p), cloud, atol=1e-5)

    def test_ply_color_roundtrip(self, tmp_path, cloud, rng):
        colors = rng.uniform(0, 1, (64, 3))
        p = str(tmp_path / "c.ply")
        save_ply(p, cloud, colors=colors, binary=True)
        np.testing.assert_allclose(load_ply(p), cloud, atol=1e-6)

    def test_pcd_reader(self, tmp_path, cloud):
        p = str(tmp_path / "c.pcd")
        with open(p, "w") as f:
            f.write("VERSION .7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                    f"COUNT 1 1 1\nWIDTH {len(cloud)}\nHEIGHT 1\n"
                    f"POINTS {len(cloud)}\nDATA ascii\n")
            for p3 in cloud:
                f.write(f"{p3[0]} {p3[1]} {p3[2]}\n")
        np.testing.assert_allclose(load_pcd(p), cloud, atol=1e-5)


class TestPlot:
    def test_plot_grid_writes_png(self, tmp_path, cloud):
        rows = [np.stack([cloud, cloud]), np.stack([cloud, cloud])]
        p = str(tmp_path / "grid.png")
        plot_grid(p, rows)
        assert (tmp_path / "grid.png").stat().st_size > 1000

    def test_three_views_writes_png(self, tmp_path, cloud):
        p = str(tmp_path / "tv.png")
        plot_three_views(p, [cloud, cloud])
        assert (tmp_path / "tv.png").stat().st_size > 1000


class TestRenderer:
    def test_draw_point_cloud(self, cloud):
        img = draw_point_cloud(cloud, canvas_size=100, diameter=9)
        assert img.shape == (100, 100)
        assert img.max() <= 1.0 and img.max() > 0
        assert img.min() == 0.0

    def test_three_views_panorama(self, cloud):
        img = point_cloud_three_views(cloud)
        assert img.shape == (500, 1500)
