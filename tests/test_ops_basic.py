"""Unit tests for the kernel layer vs tiny brute-force numpy oracles —
the oracle style the reference itself uses in its (commented-out) `test_emd`
(`/root/reference/metrics/emd/emd_module.py:81-97`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_gan_tpu import ops


def brute_sqdist(x, y):
    return ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)


class TestPairwise:
    def test_pairwise_sqdist(self, rng):
        x = rng.standard_normal((2, 17, 3)).astype(np.float32)
        y = rng.standard_normal((2, 29, 3)).astype(np.float32)
        got = np.asarray(ops.pairwise_sqdist(jnp.array(x), jnp.array(y)))
        np.testing.assert_allclose(got, brute_sqdist(x, y), atol=1e-4)

    def test_knn_excludes_self(self, rng):
        x = rng.standard_normal((2, 32, 3)).astype(np.float32)
        idx = np.asarray(ops.knn_indices(jnp.array(x), 5))
        assert idx.shape == (2, 32, 5)
        self_idx = np.arange(32)[None, :, None]
        assert not np.any(idx == self_idx)

    def test_knn_matches_sort_oracle(self, rng):
        x = rng.standard_normal((1, 40, 3)).astype(np.float32)
        k = 6
        idx = np.asarray(ops.knn_indices(jnp.array(x), k))
        d = brute_sqdist(x, x)[0]
        np.fill_diagonal(d, np.inf)
        oracle = np.argsort(d, axis=1)[:, :k]
        # compare the neighbor *sets* (tie order may differ)
        for n in range(40):
            assert set(idx[0, n]) == set(oracle[n])


class TestGatherVJP:
    def test_matches_native_autodiff(self, rng):
        """Custom one-hot-matmul backward == take_along_axis autodiff."""
        from sp_gan_tpu.ops.edge import _gather, gather_neighbors
        x = jnp.array(rng.standard_normal((2, 16, 4)).astype(np.float32))
        idx = jnp.array(rng.integers(0, 16, (2, 16, 3)).astype(np.int32))
        w = jnp.array(rng.standard_normal((2, 16, 3, 4)).astype(np.float32))
        g_custom = jax.grad(lambda v: jnp.sum(gather_neighbors(v, idx) * w))(x)
        g_native = jax.grad(lambda v: jnp.sum(_gather(v, idx) * w))(x)
        np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_native),
                                   atol=1e-5)

    def test_edge_features_grad_matches_reference_formulation(self, rng):
        """grad through edge_features == grad through an index-free numpy-style
        recomputation on the same indices."""
        from sp_gan_tpu import ops
        x = jnp.array(rng.standard_normal((1, 12, 3)).astype(np.float32))
        idx = ops.knn_indices(x, 4)

        def loss_ours(v):
            return jnp.sum(ops.edge_features(v, 4, idx=idx) ** 2)

        def loss_manual(v):
            nbrs = jax.vmap(lambda xb, ib: xb[ib])(v, idx)
            central = jnp.broadcast_to(v[:, :, None, :], nbrs.shape)
            ee = jnp.concatenate([central, nbrs - central], -1)
            return jnp.sum(ee ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_ours)(x)),
            np.asarray(jax.grad(loss_manual)(x)), atol=1e-4)


class TestEdgeFeatures:
    def test_shape_and_content(self, rng):
        x = rng.standard_normal((2, 16, 4)).astype(np.float32)
        k = 3
        ee, idx = ops.edge_features(jnp.array(x), k, return_idx=True)
        ee, idx = np.asarray(ee), np.asarray(idx)
        assert ee.shape == (2, 16, k, 8)
        # first half is the central point
        np.testing.assert_allclose(
            ee[..., :4], np.broadcast_to(x[:, :, None, :], (2, 16, k, 4)), atol=1e-6
        )
        # second half is neighbor - central
        for b in range(2):
            for n in range(16):
                for j in range(k):
                    np.testing.assert_allclose(
                        ee[b, n, j, 4:], x[b, idx[b, n, j]] - x[b, n], atol=1e-6
                    )

    def test_edge_features_xyz(self, rng):
        feats = rng.standard_normal((1, 12, 8)).astype(np.float32)
        pc = rng.standard_normal((1, 12, 3)).astype(np.float32)
        e_fea, e_xyz = ops.edge.edge_features_xyz(jnp.array(feats), jnp.array(pc), 4)
        assert e_fea.shape == (1, 12, 4, 16)
        assert e_xyz.shape == (1, 12, 4, 6)

    def test_diff_features_match_concat_half(self, rng):
        from sp_gan_tpu.ops.edge import edge_diff_features
        x = jnp.array(rng.standard_normal((2, 16, 4)).astype(np.float32))
        ee = ops.edge_features(x, 3)
        diff = edge_diff_features(x, 3)
        assert diff.shape == (2, 16, 3, 4)
        np.testing.assert_allclose(np.asarray(diff), np.asarray(ee[..., 4:]),
                                   atol=1e-6)

    def test_diff_features_grad_matches_concat(self, rng):
        from sp_gan_tpu.ops.edge import edge_diff_features
        x = jnp.array(rng.standard_normal((2, 16, 4)).astype(np.float32))
        w = jnp.array(rng.standard_normal((2, 16, 3, 4)).astype(np.float32))
        g_diff = jax.grad(
            lambda v: jnp.sum(edge_diff_features(v, 3) * w))(x)
        g_concat = jax.grad(
            lambda v: jnp.sum(ops.edge_features(v, 3)[..., 4:] * w))(x)
        np.testing.assert_allclose(np.asarray(g_diff), np.asarray(g_concat),
                                   atol=1e-5)


class TestChamfer:
    def test_nn_distance_oracle(self, rng):
        x = rng.standard_normal((2, 20, 3)).astype(np.float32)
        y = rng.standard_normal((2, 25, 3)).astype(np.float32)
        d1, i1, d2, i2 = ops.nn_distance(jnp.array(x), jnp.array(y))
        d = brute_sqdist(x, y)
        np.testing.assert_allclose(np.asarray(d1), d.min(2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2), d.min(1), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i1), d.argmin(2))
        np.testing.assert_array_equal(np.asarray(i2), d.argmin(1))

    def test_chamfer_tiled_matches_dense(self, rng):
        x = rng.standard_normal((2, 64, 3)).astype(np.float32)
        y = rng.standard_normal((2, 48, 3)).astype(np.float32)
        a1, a2 = ops.chamfer(jnp.array(x), jnp.array(y))
        from sp_gan_tpu.ops.chamfer import chamfer_tiled
        t1, t2 = chamfer_tiled(jnp.array(x), jnp.array(y), chunk=16)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(t1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(t2), atol=1e-5)

    def test_chamfer_grad_is_finite_and_correct_direction(self, rng):
        x = jnp.array(rng.standard_normal((1, 10, 3)).astype(np.float32))
        y = x + 0.1  # shifted copy
        g = jax.grad(lambda a: ops.chamfer(a, y)[0].sum())(x)
        assert np.all(np.isfinite(np.asarray(g)))
        # moving x toward y reduces the distance: grad points away from y
        assert np.sum(np.asarray(g) * np.asarray(x - y)) > 0


class TestSampling:
    def test_fps_first_index_and_spread(self, rng):
        x = rng.standard_normal((2, 50, 3)).astype(np.float32)
        idx = np.asarray(ops.farthest_point_sample(jnp.array(x), 8))
        assert idx.shape == (2, 8)
        assert np.all(idx[:, 0] == 0)
        for b in range(2):
            assert len(set(idx[b].tolist())) == 8  # distinct picks

    def test_fps_oracle(self, rng):
        x = rng.standard_normal((1, 30, 3)).astype(np.float32)
        idx = np.asarray(ops.farthest_point_sample(jnp.array(x), 5))[0]
        # numpy oracle
        chosen = [0]
        mind = ((x[0] - x[0, 0]) ** 2).sum(-1)
        for _ in range(4):
            nxt = int(np.argmax(mind))
            chosen.append(nxt)
            mind = np.minimum(mind, ((x[0] - x[0, nxt]) ** 2).sum(-1))
        np.testing.assert_array_equal(idx, chosen)

    def test_ball_query_within_radius(self, rng):
        x = rng.uniform(-1, 1, (1, 60, 3)).astype(np.float32)
        r, ns = 0.7, 8
        idx = np.asarray(ops.ball_query(r, ns, jnp.array(x), jnp.array(x)))
        d = brute_sqdist(x, x)[0]
        for q in range(60):
            inside = set(np.where(d[q] < r * r)[0].tolist())
            got = set(idx[0, q].tolist())
            assert got.issubset(inside | {0})

    def test_three_nn_interpolate(self, rng):
        unknown = rng.standard_normal((1, 15, 3)).astype(np.float32)
        known = rng.standard_normal((1, 7, 3)).astype(np.float32)
        feats = rng.standard_normal((1, 7, 5)).astype(np.float32)
        dist, idx = ops.three_nn(jnp.array(unknown), jnp.array(known))
        d = brute_sqdist(unknown, known)[0]
        oracle_idx = np.argsort(d, axis=1)[:, :3]
        assert set(map(tuple, np.sort(np.asarray(idx)[0], 1))) == set(
            map(tuple, np.sort(oracle_idx, 1))
        )
        from sp_gan_tpu.ops.sampling import interpolation_weights
        w = interpolation_weights(dist)
        out = ops.three_interpolate(jnp.array(feats), idx, w)
        assert out.shape == (1, 15, 5)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)

    def test_mds_distinct(self, rng):
        x = rng.standard_normal((2, 40, 3)).astype(np.float32)
        idx = np.asarray(ops.minimum_density_sample(jnp.array(x), 10))
        for b in range(2):
            assert len(set(idx[b].tolist())) == 10


class TestGrouping:
    def test_knn_query_includes_self(self, rng):
        x = rng.standard_normal((1, 20, 3)).astype(np.float32)
        idx, dist = ops.knn_query(4, jnp.array(x))
        idx = np.asarray(idx)
        assert np.all(idx[0, :, 0] == np.arange(20))  # self is nearest
        assert np.asarray(dist)[0, :, 0].max() < 1e-5

    def test_group_points(self, rng):
        x = rng.standard_normal((1, 10, 6)).astype(np.float32)
        idx = rng.integers(0, 10, (1, 5, 3)).astype(np.int32)
        out = np.asarray(ops.group_points(jnp.array(x), jnp.array(idx)))
        for s in range(5):
            for j in range(3):
                np.testing.assert_allclose(out[0, s, j], x[0, idx[0, s, j]])

    def test_query_and_group_recenters(self, rng):
        x = rng.standard_normal((1, 16, 3)).astype(np.float32)
        grouped = np.asarray(ops.query_and_group(jnp.array(x), None, 4))
        # self-neighbor (slot 0) recentered to zero
        np.testing.assert_allclose(grouped[0, :, 0, :], 0.0, atol=1e-5)


class TestEMD:
    def test_emd_identity(self, rng):
        x = jnp.array(rng.uniform(0, 1, (2, 32, 3)).astype(np.float32))
        dist, assign = ops.emd_auction(x, x, eps=0.002, iters=100)
        # matching a cloud with itself: near-zero cost
        assert float(dist.mean()) < 1e-3

    def test_emd_verified_cost(self, rng):
        """The reference's own verification trick: recompute cost from the
        returned assignment (emd_module.py:81-97)."""
        x1 = jnp.array(rng.uniform(0, 1, (2, 64, 3)).astype(np.float32))
        x2 = jnp.array(rng.uniform(0, 1, (2, 64, 3)).astype(np.float32))
        dist, assign = ops.emd_auction(x1, x2, eps=0.02, iters=300)
        x2n, an = np.asarray(x2), np.asarray(assign)
        matched = np.take_along_axis(x2n, an[..., None], axis=1)
        recomputed = ((np.asarray(x1) - matched) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(dist), recomputed, atol=1e-5)

    def test_emd_near_optimal_on_permutation(self, rng):
        """Matching a permuted copy of itself should recover ~zero cost."""
        x = rng.uniform(0, 1, (1, 48, 3)).astype(np.float32)
        perm = rng.permutation(48)
        dist, assign = ops.emd_auction(
            jnp.array(x), jnp.array(x[:, perm]), eps=0.001, iters=500
        )
        assert float(dist.mean()) < 5e-3

    def test_emd_grad_only_xyz1(self, rng):
        x1 = jnp.array(rng.uniform(0, 1, (1, 32, 3)).astype(np.float32))
        x2 = jnp.array(rng.uniform(0, 1, (1, 32, 3)).astype(np.float32))
        g1, g2 = jax.grad(
            lambda a, b: ops.emd_auction(a, b, 0.02, 50)[0].sum(), argnums=(0, 1)
        )(x1, x2)
        assert np.any(np.asarray(g1) != 0)
        np.testing.assert_array_equal(np.asarray(g2), 0)


class TestExpansion:
    def test_shapes_and_root(self, rng):
        x = jnp.array(rng.standard_normal((2, 64, 3)).astype(np.float32))
        dist, assign, mean_len = ops.expansion_penalty(x, 32, alpha=1.5)
        assert dist.shape == (2, 64)
        assert assign.shape == (2, 64)
        assert mean_len.shape == (2,)
        assert np.all(np.asarray(mean_len) > 0)

    def test_uniform_grid_no_penalty(self):
        # perfectly uniform 1D chain: every MST edge == mean, none > 1.5*mean
        pts = np.zeros((1, 16, 3), np.float32)
        pts[0, :, 0] = np.arange(16)
        dist, assign, mean_len = ops.expansion_penalty(jnp.array(pts), 16, 1.5)
        np.testing.assert_allclose(np.asarray(dist), 0.0, atol=1e-6)
        assert np.all(np.asarray(assign) == -1)
        np.testing.assert_allclose(np.asarray(mean_len), 1.0, atol=1e-5)

    def test_outlier_penalized(self):
        pts = np.zeros((1, 8, 3), np.float32)
        pts[0, :, 0] = np.arange(8)
        pts[0, 7, 0] = 100.0  # outlier: edge length 94 >> mean
        dist, assign, _ = ops.expansion_penalty(jnp.array(pts), 8, 1.5)
        assert np.asarray(dist).max() > 10.0

    def test_grad_pulls_outlier_in(self):
        pts = np.zeros((1, 8, 3), np.float32)
        pts[0, :, 0] = np.arange(8)
        pts[0, 7, 0] = 100.0
        g = jax.grad(lambda x: ops.expansion_penalty(x, 8, 1.5)[0].sum())(
            jnp.array(pts)
        )
        g = np.asarray(g)
        assert np.any(g != 0)


class TestVoxel:
    def test_counts_and_normalization(self, rng):
        clouds = rng.uniform(-0.49, 0.49, (4, 100, 3)).astype(np.float32)
        counts = np.asarray(ops.voxel_occupancy(jnp.array(clouds), res=8))
        assert counts.sum() == 400
        out = rng.uniform(0.6, 1.0, (1, 50, 3)).astype(np.float32)
        counts2 = np.asarray(ops.voxel_occupancy(jnp.array(out), res=8))
        assert counts2.sum() == 0

    def test_matches_numpy_histogram(self, rng):
        clouds = rng.uniform(-0.5, 0.5, (2, 200, 3)).astype(np.float32)
        res = 6
        counts = np.asarray(ops.voxel_occupancy(jnp.array(clouds), res=res))
        pts = clouds.reshape(-1, 3)
        inside = np.all((pts >= -0.5) & (pts < 0.5), axis=-1)
        ids = np.floor((pts[inside] + 0.5) * res).astype(int)
        ids = np.clip(ids, 0, res - 1)
        oracle = np.zeros((res, res, res))
        np.add.at(oracle, (ids[:, 0], ids[:, 1], ids[:, 2]), 1)
        np.testing.assert_array_equal(counts.reshape(res, res, res), oracle)


class TestPointopsExtras:
    def test_feature_distribute_gather(self, rng):
        from sp_gan_tpu.ops.grouping import feature_distribute, feature_gather
        max_xyz = jnp.array(rng.standard_normal((1, 8, 3)).astype(np.float32))
        xyz = max_xyz[:, [3, 1, 7, 0]]      # exact copies of known rows
        idx = np.asarray(feature_distribute(max_xyz, xyz))
        np.testing.assert_array_equal(idx[0], [3, 1, 7, 0])
        feats = jnp.array(rng.standard_normal((1, 8, 5)).astype(np.float32))
        out = np.asarray(feature_gather(feats, jnp.array(idx)))
        np.testing.assert_allclose(out[0], np.asarray(feats)[0, [3, 1, 7, 0]])

    def test_label_stat(self, rng):
        from sp_gan_tpu.ops.grouping import label_stat, knn_query
        xyz = jnp.array(rng.standard_normal((1, 16, 3)).astype(np.float32))
        labels = jnp.array(rng.integers(0, 3, (1, 16)).astype(np.int32))
        idx, _ = knn_query(4, xyz)
        hist = np.asarray(label_stat(labels, idx, 3))
        assert hist.shape == (1, 16, 3)
        np.testing.assert_array_equal(hist.sum(-1), 4)

    def test_label_stat_ball_range(self, rng):
        from sp_gan_tpu.ops.grouping import label_stat_ball_range
        xyz = jnp.array(rng.uniform(-1, 1, (1, 32, 3)).astype(np.float32))
        labels = jnp.array(rng.integers(0, 2, (1, 32)).astype(np.int32))
        hist = np.asarray(label_stat_ball_range(labels, xyz, xyz, 10.0, 2))
        # radius covers everything: each histogram = global label counts
        glob = np.bincount(np.asarray(labels)[0], minlength=2)
        np.testing.assert_array_equal(hist[0, 0], glob)


class TestEMDOptimality:
    def test_auction_near_optimal_vs_hungarian(self, rng):
        """Auction theory: total cost <= optimal + n*eps. Verify against
        scipy's exact assignment on small instances."""
        from scipy.optimize import linear_sum_assignment
        n = 48
        x1 = rng.uniform(0, 1, (1, n, 3)).astype(np.float32)
        x2 = rng.uniform(0, 1, (1, n, 3)).astype(np.float32)
        eps = 0.002
        dist, assign = ops.emd_auction(jnp.array(x1), jnp.array(x2),
                                       eps, 2000)
        cost = float(np.asarray(dist).sum())
        d = ((x1[0][:, None] - x2[0][None]) ** 2).sum(-1)
        ri, ci = linear_sum_assignment(d)
        optimal = float(d[ri, ci].sum())
        assert cost <= optimal + n * eps + 1e-4, (cost, optimal)

    def test_assignment_bijective_when_converged(self, rng):
        n = 32
        x1 = rng.uniform(0, 1, (1, n, 3)).astype(np.float32)
        x2 = rng.uniform(0, 1, (1, n, 3)).astype(np.float32)
        _, assign = ops.emd_auction(jnp.array(x1), jnp.array(x2), 0.005, 2000)
        assert len(set(np.asarray(assign)[0].tolist())) == n
