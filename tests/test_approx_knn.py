"""Approximate (banded / candidate-pruned) kNN selection — ops/approx_knn.py.

Exactness contract: with full coverage both pruned selections reduce to the
exact reference semantics (squared-L2, self excluded); restricted, they only
ever select inside their candidate sets. Recall on REAL trained features is
measured by scripts/probe_approx_knn.py (99.9% at the N=8192 checkpoint);
these tests pin the mechanics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sp_gan_tpu.config import Config
from sp_gan_tpu.ops.approx_knn import (knn_indices_candidates,
                                       knn_indices_window,
                                       template_candidates)
from sp_gan_tpu.ops.pairwise import knn_indices


def banded_oracle(x, k, W):
    """Brute-force exact-band kNN: squared-L2 among keys at circular index
    distance in (0, W], ascending. The contract both the XLA window
    selection and the fused banded kernel must match."""
    x = np.asarray(x, np.float64)
    B, N, _ = x.shape
    d = ((x[:, :, None] - x[:, None]) ** 2).sum(-1)          # [B, N, N]
    i = np.arange(N)
    off = (i[None, :] - i[:, None]) % N
    off = np.minimum(off, N - off)
    d = np.where((off == 0) | (off > W), np.inf, d)
    return np.argsort(d, axis=-1)[..., :k].astype(np.int32)


class TestWindow:
    def test_matches_banded_oracle(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32))
        for W in (5, 16, 28):
            ref = np.sort(banded_oracle(x, 5, W), axis=-1)
            w = np.sort(np.asarray(
                knn_indices_window(x, 5, window=W, block=8)), axis=-1)
            np.testing.assert_array_equal(ref, w)

    def test_odd_n_adapts_block_and_guards_wrap(self, rng):
        # N not divisible by the default block: the query chunk shrinks
        # instead of asserting (edge_diff_features calls with block left
        # at its default for any N); 2W >= N must raise — the circular
        # band would self-overlap and return duplicate neighbors
        N = 96  # default block 256 > N, 96 % 64 != 0 -> adapts to 32
        x = jnp.asarray(rng.standard_normal((2, N, 8)).astype(np.float32))
        idx = np.asarray(knn_indices_window(x, 5, window=30))
        ref = np.sort(banded_oracle(x, 5, 30), axis=-1)
        np.testing.assert_array_equal(ref, np.sort(idx, axis=-1))
        with pytest.raises(AssertionError):
            knn_indices_window(x, 5, window=N // 2)

    def test_restricted_window_stays_in_band(self, rng):
        N, W, Q = 64, 6, 8
        x = jnp.asarray(rng.standard_normal((2, N, 8)).astype(np.float32))
        idx = np.asarray(knn_indices_window(x, 5, window=W, block=Q))
        off = (idx - np.arange(N)[None, :, None]) % N
        off = np.minimum(off, N - off)
        # exact band: never outside +-W, independent of the block size
        assert off.max() <= W
        idx2 = np.asarray(knn_indices_window(x, 5, window=W, block=16))
        np.testing.assert_array_equal(idx, idx2)
        # self never selected
        assert (idx != np.arange(N)[None, :, None]).all()

    def test_smooth_features_high_recall(self):
        """Features that are smooth over the fibonacci template (the
        EdgeConv2 situation) are recovered by a modest window."""
        from sp_gan_tpu.data import sphere_template
        t = sphere_template(512)
        # smooth nonlinear lift of template position
        feats = np.concatenate([np.sin(3 * t), np.cos(2 * t), t ** 2], -1)
        x = jnp.asarray(feats[None].astype(np.float32))
        exact = np.asarray(knn_indices(x, 8))
        approx = np.asarray(knn_indices_window(x, 8, window=64, block=128))
        hit = np.mean([len(np.intersect1d(exact[0, i], approx[0, i])) / 8
                       for i in range(512)])
        assert hit > 0.97, hit


class TestCandidates:
    def test_full_candidates_match_exact(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32))
        cand = jnp.asarray(np.stack(
            [np.delete(np.arange(64), i) for i in range(64)]).astype(np.int32))
        exact = np.sort(np.asarray(knn_indices(x, 5)), axis=-1)
        c = np.sort(np.asarray(knn_indices_candidates(x, 5, cand, block=16)),
                    axis=-1)
        np.testing.assert_array_equal(exact, c)

    def test_selection_subset_of_candidates(self, rng):
        from sp_gan_tpu.data import sphere_template
        t = sphere_template(128)
        cand = np.asarray(template_candidates(t, 16))
        assert cand.shape == (128, 16)
        assert (cand != np.arange(128)[:, None]).all()   # self excluded
        x = jnp.asarray(rng.standard_normal((2, 128, 8)).astype(np.float32))
        idx = np.asarray(knn_indices_candidates(x, 4, jnp.asarray(cand),
                                                block=32))
        for i in range(128):
            assert np.isin(idx[:, i], cand[i]).all()


class TestWindowKernel:
    """Fused banded kNN+gather kernel (ops/pallas/knn.py::
    knn_edge_window_pallas) vs the XLA window selection and the oracle —
    interpret mode on CPU; the same comparisons run compiled on the chip
    via scripts/check_tpu_kernels.py."""

    def _setup(self, rng, N=128, C=16):
        return jnp.asarray(rng.standard_normal((2, N, C)).astype(np.float32))

    def test_kernel_matches_oracle(self, rng):
        from jax.experimental.pallas import tpu as pltpu
        from sp_gan_tpu.ops.pallas.knn import knn_edge_window_pallas
        x, k, W = self._setup(rng), 4, 16
        ref = banded_oracle(x, k, W)
        with pltpu.force_tpu_interpret_mode():
            ee, idx = knn_edge_window_pallas(x, k, W, tq=32)
        np.testing.assert_array_equal(np.asarray(idx), ref)
        # gathered edge values: one-hot MXU gather is exact
        nbrs = np.asarray(jax.vmap(lambda xx, ii: xx[ii])(x, idx))
        central = np.asarray(x)[:, :, None, :]
        np.testing.assert_allclose(np.asarray(ee[..., 16:]), nbrs - central,
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ee[..., :16]),
            np.broadcast_to(central, nbrs.shape), atol=0)

    def test_kernel_diff_only_and_packed(self, rng):
        from jax.experimental.pallas import tpu as pltpu
        from sp_gan_tpu.ops.pallas.knn import knn_edge_window_pallas
        x, k, W = self._setup(rng), 4, 16
        ref = banded_oracle(x, k, W)
        with pltpu.force_tpu_interpret_mode():
            diff, idx = knn_edge_window_pallas(x, k, W, tq=32,
                                               diff_only=True)
            _, idx_p = knn_edge_window_pallas(x, k, W, tq=32,
                                              diff_only=True,
                                              select_mode="packed")
        np.testing.assert_array_equal(np.asarray(idx), ref)
        # packed selection: same neighbor SETS up to near-tie quantization
        # (random f32 data has no such ties)
        np.testing.assert_array_equal(np.sort(np.asarray(idx_p), -1),
                                      np.sort(ref, -1))
        assert diff.shape == (2, 128, k, 16)
        nbrs = np.asarray(jax.vmap(lambda xx, ii: xx[ii])(x, idx))
        np.testing.assert_allclose(np.asarray(diff),
                                   nbrs - np.asarray(x)[:, :, None, :],
                                   atol=1e-6)

    def test_kernel_tq_independent(self, rng):
        from jax.experimental.pallas import tpu as pltpu
        from sp_gan_tpu.ops.pallas.knn import knn_edge_window_pallas
        x, k, W = self._setup(rng), 4, 12
        with pltpu.force_tpu_interpret_mode():
            _, i32 = knn_edge_window_pallas(x, k, W, tq=32)
            _, i16 = knn_edge_window_pallas(x, k, W, tq=16)
        np.testing.assert_array_equal(np.asarray(i32), np.asarray(i16))

    def test_edge_diff_features_window_grads(self, rng, monkeypatch):
        """grad through the banded custom VJP (the training path of
        --knn_mode approx on TPU) — finite, nonzero, and equal to autodiff
        of the XLA gather construction at the same indices."""
        import sp_gan_tpu.ops.dispatch as dispatch
        monkeypatch.setattr(dispatch, "pallas_enabled", lambda: True)
        from jax.experimental.pallas import tpu as pltpu
        from sp_gan_tpu.ops.edge import edge_diff_features, gather_neighbors
        # N >= 2W + 256: edge_diff_features only bands when the fused
        # kernel's tq=256 key slices fit (smaller N falls back to exact)
        x = self._setup(rng, N=512, C=8)
        W = 10

        def loss(v):
            d = edge_diff_features(v, 4, window=W)
            return jnp.sum(d ** 3)

        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(loss)(x)
        idx = jnp.asarray(banded_oracle(x, 4, W))

        def loss_ref(v):
            d = gather_neighbors(v, idx) - v[:, :, None, :]
            return jnp.sum(d ** 3)

        g_ref = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)


class TestGeneratorIntegration:
    def test_forward_runs_and_config_validates(self, rng):
        from sp_gan_tpu.nn import Generator
        with pytest.raises(ValueError):
            Config(knn_mode="banana")
        cfg = Config(np=512, nk=8, nz=16, dtype="float32",
                     knn_mode="approx", knn_window=64)
        G = Generator(cfg)
        x = jnp.asarray(rng.standard_normal((2, 512, 3)), jnp.float32)
        z = jnp.zeros((2, 512, 16), jnp.float32)
        v = G.init(jax.random.PRNGKey(0), x, z, train=False)
        out = G.apply(v, x, z, train=False)
        assert out.shape == (2, 512, 3) and np.isfinite(np.asarray(out)).all()
        # param tree identical to the exact config: approx changes only the
        # neighbor selection, so checkpoints are interchangeable
        v2 = Generator(cfg.replace(knn_mode="exact")).init(
            jax.random.PRNGKey(0), x, z, train=False)
        assert jax.tree.structure(v) == jax.tree.structure(v2)

    def test_train_step_grads_flow(self, rng):
        """One fused G+D step under knn_mode=approx: finite losses, params
        move (selection is stop-gradiented; everything else differentiates
        through the gathered edges)."""
        from sp_gan_tpu.data import SyntheticDataset, sphere_template
        from sp_gan_tpu.train import create_train_state, make_train_step
        cfg = Config(np=512, bs=2, nk=8, nz=16, dtype="float32",
                     knn_mode="approx", knn_window=64, donate_state=False)
        state, G, D, g_tx, d_tx = create_train_state(cfg,
                                                     jax.random.PRNGKey(0))
        step = make_train_step(cfg, G, D, g_tx, d_tx,
                               jnp.asarray(sphere_template(cfg.np)))
        batch = jnp.asarray(SyntheticDataset(n_items=2, n_points=512).data)
        before = jax.tree.leaves(state.g_params)[0].copy()
        state2, m = step(state, batch)
        assert np.isfinite(float(m["d_loss"]))
        assert np.isfinite(float(m["g_loss"]))
        assert not np.allclose(before, jax.tree.leaves(state2.g_params)[0])
