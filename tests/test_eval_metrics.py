"""Metric-suite tests vs numpy oracles and sanity properties."""

import jax.numpy as jnp
import numpy as np
import pytest

from sp_gan_tpu.eval import (
    compute_all_metrics,
    coverage,
    f_score,
    frechet_distance,
    jsd,
    knn_two_sample,
    mmd,
    pairwise_cd_matrix,
)
from sp_gan_tpu.eval.fpd import FPD, activation_statistics


def brute_cd(a, b):
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return d.min(1).mean() + d.min(0).mean()


class TestPairwiseCD:
    def test_matches_oracle(self, rng):
        gen = rng.standard_normal((3, 16, 3)).astype(np.float32)
        ref = rng.standard_normal((4, 16, 3)).astype(np.float32)
        M = np.asarray(pairwise_cd_matrix(jnp.array(gen), jnp.array(ref)))
        assert M.shape == (3, 4)
        for i in range(3):
            for j in range(4):
                assert M[i, j] == pytest.approx(brute_cd(gen[i], ref[j]), rel=1e-4)

    def test_self_diagonal_zero(self, rng):
        x = rng.standard_normal((3, 16, 3)).astype(np.float32)
        M = np.asarray(pairwise_cd_matrix(jnp.array(x), jnp.array(x)))
        np.testing.assert_allclose(np.diag(M), 0.0, atol=1e-5)


class TestSummaries:
    def test_cov_full(self):
        d = np.array([[0.1, 1.0], [1.0, 0.1]])  # each gen matches distinct ref
        assert coverage(d) == 1.0

    def test_cov_collapsed(self):
        d = np.array([[0.1, 1.0], [0.1, 1.0]])  # both gens match ref 0
        assert coverage(d) == 0.5

    def test_mmd(self):
        d = np.array([[0.5, 2.0], [1.0, 0.25]])
        assert mmd(d) == pytest.approx((0.5 + 0.25) / 2)

    def test_1nn_separable_is_1(self, rng):
        """Perfectly distinguishable sets -> accuracy 1."""
        a = rng.standard_normal((8, 8))
        gg = ((a[:, None] - a[None]) ** 2).sum(-1)
        tt = gg.copy()
        gt = np.full((8, 8), 100.0)  # far apart
        assert knn_two_sample(gg, gt, tt, 1) == 1.0

    def test_1nn_identical_is_half_ish(self, rng):
        """Interleaved identical distributions -> ~0.5."""
        x = rng.standard_normal((64, 4))
        y = rng.standard_normal((64, 4))
        dx = lambda a, b: ((a[:, None] - b[None]) ** 2).sum(-1)
        acc = knn_two_sample(dx(x, x), dx(x, y), dx(y, y), 1)
        assert 0.3 < acc < 0.7


class TestJSD:
    def test_identical_zero(self, rng):
        c = rng.uniform(-0.4, 0.4, (8, 128, 3)).astype(np.float32)
        assert jsd(c, c) == pytest.approx(0.0, abs=1e-9)

    def test_disjoint_one_bit(self, rng):
        a = rng.uniform(-0.45, -0.05, (4, 128, 3)).astype(np.float32)
        b = rng.uniform(0.05, 0.45, (4, 128, 3)).astype(np.float32)
        assert jsd(a, b) == pytest.approx(1.0, abs=0.01)  # log2 base


class TestFullProtocol:
    def test_compute_all_metrics_keys(self, rng):
        gen = rng.uniform(-0.4, 0.4, (6, 32, 3)).astype(np.float32)
        ref = rng.uniform(-0.4, 0.4, (6, 32, 3)).astype(np.float32)
        m = compute_all_metrics(gen, ref)
        assert set(m) == {"JSD", "jsd_scale", "COV-CD", "MMD-CD", "1NN-CD"}
        assert all(np.isfinite(v) for v in m.values())

    def test_jsd_convention_matches_inloop_eval(self, rng):
        """The final protocol's JSD and the in-loop Trainer.evaluate JSD use
        ONE convention (scale clouds by 0.5 into the voxel cube): the same
        clouds must give the same number through both paths, so eval.jsonl
        and evaluate.py JSD columns are comparable by construction
        (VERDICT r3 weak #4 — the reference itself has two incompatible JSD
        behaviors via its out-of-cube point drop, loss_utils.py:474-477)."""
        gen = rng.uniform(-0.9, 0.9, (6, 64, 3)).astype(np.float32)
        ref = rng.uniform(-0.9, 0.9, (6, 64, 3)).astype(np.float32)
        m = compute_all_metrics(gen, ref)
        # the exact expression Trainer.evaluate uses (train/trainer.py)
        inloop = jsd(0.5 * gen, 0.5 * ref, warn=False)
        assert m["jsd_scale"] == 0.5
        assert m["JSD"] == pytest.approx(inloop, abs=1e-12)
        # raw reference behavior stays reachable (out-of-cube points
        # dropped, with the warning)
        with pytest.warns(UserWarning, match="outside"):
            m_raw = compute_all_metrics(2.0 * gen, 2.0 * ref, jsd_scale=1.0)
        assert m_raw["jsd_scale"] == 1.0
        assert np.isfinite(m_raw["JSD"])

    def test_perfect_generator(self, rng):
        ref = rng.uniform(-0.4, 0.4, (6, 32, 3)).astype(np.float32)
        m = compute_all_metrics(ref, ref)
        assert m["MMD-CD"] == pytest.approx(0.0, abs=1e-6)
        assert m["COV-CD"] == 1.0

    def test_emd_variants_pointsharded_mesh(self, rng):
        """mesh= routes the EMD protocol through the point-sharded auction;
        EMD metric values match the unsharded protocol's."""
        import jax
        from sp_gan_tpu.parallel import make_mesh

        assert jax.device_count() >= 8
        mesh = make_mesh((8,), ("points",))
        gen = rng.uniform(-0.4, 0.4, (4, 32, 3)).astype(np.float32)
        ref = rng.uniform(-0.4, 0.4, (4, 32, 3)).astype(np.float32)
        m_u = compute_all_metrics(gen, ref, use_emd=True, emd_iters=2000)
        m_s = compute_all_metrics(gen, ref, use_emd=True, emd_iters=2000,
                                  mesh=mesh)
        assert {"COV-EMD", "MMD-EMD", "1NN-EMD"} <= set(m_s)
        assert m_s["MMD-EMD"] == pytest.approx(m_u["MMD-EMD"], rel=1e-3)
        assert m_s["COV-EMD"] == m_u["COV-EMD"]

    def test_f_score(self, rng):
        x = jnp.array(rng.uniform(-0.4, 0.4, (2, 32, 3)).astype(np.float32))
        f = f_score(x, x, threshold=0.001)
        np.testing.assert_allclose(f, 100.0, atol=0.1)


class TestFPD:
    def test_frechet_identical_zero(self, rng):
        mu = rng.standard_normal(8)
        a = rng.standard_normal((32, 8))
        sigma = np.cov(a, rowvar=False)
        assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)

    def test_frechet_mean_shift(self):
        mu1, mu2 = np.zeros(4), np.ones(4) * 2
        s = np.eye(4)
        assert frechet_distance(mu1, s, mu2, s) == pytest.approx(16.0, abs=1e-6)

    def test_fpd_end_to_end(self, rng):
        fpd = FPD(k=4, feat_dims=32, batch_size=4)
        a = rng.uniform(-0.5, 0.5, (8, 24, 3)).astype(np.float32)
        b = rng.uniform(-0.5, 0.5, (8, 24, 3)).astype(np.float32)
        same = fpd(a, a)
        diff = fpd(a, b * 3.0)  # scaled — clearly different
        assert same == pytest.approx(0.0, abs=1e-3)
        assert diff > same

    def test_stats_roundtrip(self, tmp_path, rng):
        fpd = FPD(k=4, feat_dims=32, batch_size=4)
        a = rng.uniform(-0.5, 0.5, (8, 24, 3)).astype(np.float32)
        p = str(tmp_path / "stats.npz")
        fpd.save_statistics(a, p)
        assert fpd(a, stats_path=p) == pytest.approx(0.0, abs=1e-3)


class TestCdMatrixChunking:
    """col_chunk bounds the per-row block at large N without changing the
    result (the N=8192 protocol regime needs it to fit HBM)."""

    def test_chunked_matches_unchunked(self):
        import jax.numpy as jnp
        import numpy as np
        from sp_gan_tpu.eval.metrics import pairwise_cd_matrix
        rng = np.random.default_rng(0)
        gen = jnp.asarray(rng.standard_normal((5, 64, 3)).astype(np.float32))
        ref = jnp.asarray(rng.standard_normal((6, 64, 3)).astype(np.float32))
        full = np.asarray(pairwise_cd_matrix(gen, ref, col_chunk=6))
        for c in (1, 2, 3):
            chunked = np.asarray(pairwise_cd_matrix(gen, ref, col_chunk=c))
            np.testing.assert_allclose(chunked, full, rtol=1e-6)

    def test_non_divisor_chunk_rounds_down(self):
        import jax.numpy as jnp
        import numpy as np
        from sp_gan_tpu.eval.metrics import pairwise_cd_matrix
        rng = np.random.default_rng(1)
        gen = jnp.asarray(rng.standard_normal((3, 32, 3)).astype(np.float32))
        ref = jnp.asarray(rng.standard_normal((7, 32, 3)).astype(np.float32))
        full = np.asarray(pairwise_cd_matrix(gen, ref, col_chunk=7))
        got = np.asarray(pairwise_cd_matrix(gen, ref, col_chunk=4))  # -> 1
        np.testing.assert_allclose(got, full, rtol=1e-6)


class TestPerClassMetrics:
    """Per-class slicing of the pooled gen-x-ref matrix
    (sp_gan_tpu.eval.per_class_metrics, used by scripts/eval_multiclass.py).

    Hand-built 3-gen x 4-ref matrix, refs in classes [0, 0, 1, 1]:

        gen0: nearest ref is r0 (class 0)
        gen1: nearest ref is r0 (class 0)   <- duplicates gen0's match
        gen2: nearest ref is r2 (class 1)
    """

    DISTS = np.array([
        # r0    r1    r2    r3
        [0.10, 0.50, 0.90, 0.90],   # gen0 -> r0
        [0.20, 0.60, 0.30, 0.80],   # gen1 -> r0 (within class1: r2)
        [0.70, 0.80, 0.10, 0.40],   # gen2 -> r2
    ])
    LABELS = np.array([0, 0, 1, 1])

    def test_pooled_cov_excludes_cross_class_matches(self):
        from sp_gan_tpu.eval import per_class_metrics
        out = per_class_metrics(self.DISTS, self.LABELS, 2)
        # class 0: only r0 matched of {r0, r1}
        assert out["class0"]["COV-CD"] == pytest.approx(0.5)
        # class 1 pooled: only gen2 lands there -> r2 matched of {r2, r3}.
        # The restricted argmin would ALSO credit gen1's within-class
        # nearest (r2) — same set here, but pooled must not count gen1's
        # row at all; verified by gen_share below.
        assert out["class1"]["COV-CD"] == pytest.approx(0.5)

    def test_within_class_cov_inflates(self):
        from sp_gan_tpu.eval import per_class_metrics
        out = per_class_metrics(self.DISTS, self.LABELS, 2)
        # restricted argmin inside class 1: gen0->r2, gen1->r2, gen2->r2
        # -> r2 matched -> 0.5 (ties pooled here); inside class 0:
        # gen0->r0, gen1->r0, gen2->r0 -> 0.5 as well. Build a case where
        # they differ: make r3 gen1's within-class-1 nearest.
        d = self.DISTS.copy()
        d[1, 2], d[1, 3] = 0.80, 0.30   # gen1 within class1 -> r3
        d[1, 0] = 0.05                  # pooled nearest stays r0
        out = per_class_metrics(d, self.LABELS, 2)
        assert out["class1"]["COV-CD"] == pytest.approx(0.5)         # r2 only
        assert out["class1"]["COV-CD-within"] == pytest.approx(1.0)  # r2 + r3

    def test_gen_share_and_mmd(self):
        from sp_gan_tpu.eval import per_class_metrics
        out = per_class_metrics(self.DISTS, self.LABELS, 2)
        # gen0, gen1 -> class 0; gen2 -> class 1
        assert out["class0"]["gen_share"] == pytest.approx(2 / 3)
        assert out["class1"]["gen_share"] == pytest.approx(1 / 3)
        # MMD[c] = mean over class-c refs of their closest gen
        assert out["class0"]["MMD-CD"] == pytest.approx((0.10 + 0.50) / 2)
        assert out["class1"]["MMD-CD"] == pytest.approx((0.10 + 0.40) / 2)

    def test_class_dropout_signature(self):
        from sp_gan_tpu.eval import per_class_metrics
        # every gen cloud sits on class 0: class 1 gets zero pooled share
        d = np.array([[0.1, 0.2, 5.0, 5.0],
                      [0.2, 0.1, 5.0, 5.0],
                      [0.1, 0.3, 5.0, 5.0]])
        out = per_class_metrics(d, self.LABELS, 2)
        assert out["class1"]["gen_share"] == 0.0
        assert out["class1"]["COV-CD"] == 0.0
        assert out["class1"]["MMD-CD"] == pytest.approx(5.0)
