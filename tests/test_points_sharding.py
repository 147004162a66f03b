"""Point-axis (context-parallel analog) sharding tests on the virtual
8-device CPU mesh: sharded ops must match their single-device twins."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_gan_tpu.ops import edge_features, knn_indices
from sp_gan_tpu.ops.pairwise import pairwise_sqdist
from sp_gan_tpu.parallel import make_mesh
from sp_gan_tpu.parallel.points import (
    chamfer_pointsharded,
    edge_features_pointsharded,
    knn_pointsharded,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh((8,), ("points",))


@pytest.fixture
def x(rng):
    return jnp.array(rng.standard_normal((2, 64, 3)).astype(np.float32))


class TestPointShardedKnn:
    def test_matches_dense(self, mesh, x):
        idx_s = np.asarray(knn_pointsharded(x, 4, mesh))
        idx_d = np.asarray(knn_indices(x, 4))
        for b in range(x.shape[0]):
            for n in range(x.shape[1]):
                assert set(idx_s[b, n]) == set(idx_d[b, n])


class TestPointShardedEdge:
    def test_matches_dense(self, mesh, x):
        ee_s = np.asarray(edge_features_pointsharded(x, 4, mesh))
        ee_d = np.asarray(edge_features(x, 4))
        np.testing.assert_allclose(ee_s, ee_d, atol=1e-5)


class TestPointShardedChamfer:
    def test_matches_dense(self, mesh, x, rng):
        y = jnp.array(rng.standard_normal((2, 64, 3)).astype(np.float32))
        d1_s, d2_s = chamfer_pointsharded(x, y, mesh)
        d = pairwise_sqdist(x, y)
        np.testing.assert_allclose(np.asarray(d1_s),
                                   np.asarray(jnp.min(d, -1)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(d2_s),
                                   np.asarray(jnp.min(d, -2)), atol=1e-5)


class TestCombinedMesh:
    def test_data_and_points_axes(self, rng):
        """2D mesh: batch sharded over `data`, points over `points` — the
        full large-scale layout (dp x sp analog)."""
        import numpy as np
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        from sp_gan_tpu.parallel import make_mesh
        from sp_gan_tpu.ops.pairwise import pairwise_sqdist
        from jax import lax

        mesh = make_mesh((4, 2), ("data", "points"))
        x = jnp.array(rng.standard_normal((4, 64, 3)).astype(np.float32))

        def local(x_local):
            shard = lax.axis_index("points")
            n_local = x_local.shape[1]
            x_full = lax.all_gather(x_local, "points", axis=1, tiled=True)
            d = pairwise_sqdist(x_local, x_full)
            rows = shard * n_local + jnp.arange(n_local)
            cols = jnp.arange(x_full.shape[1])
            d = jnp.where((rows[:, None] == cols[None, :])[None], jnp.inf, d)
            _, idx = lax.top_k(-d, 4)
            return idx.astype(jnp.int32)

        idx_s = shard_map(local, mesh=mesh,
                          in_specs=P("data", "points", None),
                          out_specs=P("data", "points", None))(x)
        from sp_gan_tpu.ops import knn_indices
        idx_d = np.asarray(knn_indices(x, 4))
        idx_s = np.asarray(idx_s)
        for b in range(4):
            for n in range(64):
                assert set(idx_s[b, n]) == set(idx_d[b, n])
