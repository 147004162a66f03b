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


class TestPointShardedEmd:
    """Sharded auction vs `emd_auction(..., scaled=True)` (the XLA path on
    CPU): identical round dynamics -> identical assignments, distances and
    the grad-to-xyz1-only backward."""

    def test_matches_unsharded(self, mesh, x, rng):
        from jax import shard_map
        from sp_gan_tpu.ops.emd import emd_auction
        from sp_gan_tpu.parallel.points import emd_auction_local

        y = jnp.array(rng.standard_normal((2, 64, 3)).astype(np.float32))

        def local(xl, yl):
            return emd_auction_local(xl, yl, eps=0.005, iters=5000)

        dist_s, ass_s = shard_map(
            local, mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec(None, "points", None),) * 2,
            out_specs=(jax.sharding.PartitionSpec(None, "points"),) * 2,
            check_vma=False)(x, y)
        dist_u, ass_u = emd_auction(x, y, 0.005, 5000, True)
        np.testing.assert_array_equal(np.asarray(ass_s), np.asarray(ass_u))
        np.testing.assert_allclose(np.asarray(dist_s), np.asarray(dist_u),
                                   rtol=1e-5, atol=1e-6)
        # bijection (converged within the cap)
        for b in range(2):
            assert len(set(np.asarray(ass_s)[b])) == 64

    def test_grad_to_xyz1_only(self, mesh, x, rng):
        from jax import shard_map
        from sp_gan_tpu.ops.emd import emd_auction
        from sp_gan_tpu.parallel.points import emd_auction_local
        P = jax.sharding.PartitionSpec

        y = jnp.array(rng.standard_normal((2, 64, 3)).astype(np.float32))

        def loss_s(xx, yy):
            f = shard_map(
                lambda a, b: emd_auction_local(a, b, 0.005, 5000)[0],
                mesh=mesh, in_specs=(P(None, "points", None),) * 2,
                out_specs=P(None, "points"), check_vma=False)
            return f(xx, yy).sum()

        def loss_u(xx, yy):
            return emd_auction(xx, yy, 0.005, 5000, True)[0].sum()

        gx_s, gy_s = jax.grad(loss_s, argnums=(0, 1))(x, y)
        gx_u, gy_u = jax.grad(loss_u, argnums=(0, 1))(x, y)
        np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_u),
                                   rtol=1e-5, atol=1e-6)
        assert np.all(np.asarray(gy_s) == 0) and np.all(np.asarray(gy_u) == 0)


class TestPointShardedTrainStep:
    """The full point-sharded train step (VERDICT r2 #2): single-chip
    equivalence vs the unsharded step, and an actual 2-D-mesh Trainer run."""

    def _mk(self, cfg, mesh=None, sgd=False):
        import optax
        from sp_gan_tpu.data import sphere_template
        from sp_gan_tpu.train import create_train_state
        from sp_gan_tpu.train.step import (make_train_step,
                                           make_train_step_pointsharded)
        state, G, D, g_tx, d_tx = create_train_state(
            cfg, jax.random.PRNGKey(0))
        if sgd:
            # plain SGD: (params - params_after)/lr recovers the GRADIENTS
            # (Adam's sign-normalized first step would amplify sub-rounding
            # grad noise to +-lr and mask real errors)
            g_tx = d_tx = optax.sgd(1e-2)
            state = state.replace(g_opt=g_tx.init(state.g_params),
                                  d_opt=d_tx.init(state.d_params))
        sphere = jnp.asarray(sphere_template(cfg.np))
        if mesh is None:
            step = make_train_step(cfg, G, D, g_tx, d_tx, sphere)
        else:
            step = make_train_step_pointsharded(cfg, g_tx, d_tx, sphere,
                                                mesh)
        return state, step

    def test_matches_unsharded_step(self, rng):
        """Same seeds, same batch: the (2 data x 4 points) sharded step must
        reproduce the plain step — losses to fp rounding, and (via an SGD
        transform with lr=1) the full G and D GRADIENTS. This pins every
        collective (edge all_gather, norm pmeans, pooled-max gather, grad
        psum) to the unsharded math."""
        from sp_gan_tpu.config import Config
        cfg = Config(np=64, bs=4, nk=8, nz=16, dtype="float32",
                     donate_state=False, use_pallas=False)
        mesh = make_mesh((2, 4), ("data", "points"))
        real = jnp.array(rng.standard_normal((4, 64, 3)).astype(np.float32))

        state_u, step_u = self._mk(cfg, sgd=True)
        state_s, step_s = self._mk(cfg, mesh, sgd=True)
        p0 = {"g": jax.tree_util.tree_leaves(state_u.g_params),
              "d": jax.tree_util.tree_leaves(state_u.d_params)}
        state_u, m_u = step_u(state_u, real)
        state_s, m_s = step_s(state_s, real)
        for key in m_u:
            np.testing.assert_allclose(float(m_u[key]), float(m_s[key]),
                                       rtol=2e-4, atol=1e-6, err_msg=key)
        # grads recovered from the SGD update: (p0 - p_after) / lr. D grads
        # come from identical inputs -> tight; G grads flow through the
        # JUST-UPDATED D (whose params already differ at fp rounding), so
        # small relative slack — still far below any bookkeeping error
        # (a missing/incorrect collective scales grads by 2-8x).
        # elementwise atol 1e-3: isolated max-pool argmax flips on fp
        # near-ties reroute single gradient elements; the 0.5% aggregate
        # check below is what catches bookkeeping errors (those scale
        # EVERY element by 2-8x)
        for name, tol, tree_u, tree_s in (
                ("g", 1e-3, state_u.g_params, state_s.g_params),
                ("d", 1e-3, state_u.d_params, state_s.d_params)):
            flat_u = jax.tree_util.tree_leaves(tree_u)
            flat_s = jax.tree_util.tree_leaves(tree_s)
            for p, a, b in zip(p0[name], flat_u, flat_s):
                ga = (np.asarray(p) - np.asarray(a)) / 1e-2
                gb = (np.asarray(p) - np.asarray(b)) / 1e-2
                np.testing.assert_allclose(
                    ga, gb, rtol=2e-2, atol=tol,
                    err_msg=f"{name} grads diverge")
                denom = np.abs(ga).mean()
                if denom > 1e-5:   # skip zero-grad leaves (bias under BN)
                    assert np.abs(ga - gb).mean() / denom < 5e-3, \
                        f"{name} grads diverge in aggregate"
        flat_u = jax.tree_util.tree_leaves(state_u.d_stats)
        flat_s = jax.tree_util.tree_leaves(state_s.d_stats)
        for a, b in zip(flat_u, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-5)

    def test_wgan_gp_variant_runs(self, rng):
        from sp_gan_tpu.config import Config
        cfg = Config(np=32, bs=4, nk=8, nz=16, gan="wgan",
                     donate_state=False, use_pallas=False)
        mesh = make_mesh((2, 4), ("data", "points"))
        real = jnp.array(rng.standard_normal((4, 32, 3)).astype(np.float32))
        state, step = self._mk(cfg, mesh)
        state, m = step(state, real)
        assert np.isfinite(float(m["d_loss"]))

    def test_per_shard_bn_matches_grouped(self, rng):
        """cfg.bn_stats="per_shard" under the (2 data x 4 points) sharded
        step: BN moments pool over `points` only, so each data replica
        normalizes by its own stats and running averages track replica 0.
        The oracle is the GSPMD grouped-BN math (mesh_shape=(2,) ->
        bn_groups=2, the same contiguous batch halves) run unsharded —
        losses, running stats and post-step params must all agree.

        Tolerances are looser than the global-stats test above: component
        isolation shows SPBatchNorm/EdgeBlock grouped-vs-collective agree to
        <5e-7 on identical inputs, but per-replica normalization divides by
        a variance over only bs/n_data samples, so the sharded edge ops'
        ~1e-6 reduce-order noise is amplified ~e2-e3x through the
        rsqrt chains (measured: 5e-4 G-forward drift at bs=4). A
        bookkeeping error (wrong axis pooled, missing pmean) shifts losses
        2-8x, far above the 2e-2 bar."""
        from sp_gan_tpu.config import Config
        base = dict(np=64, bs=8, nk=8, nz=16, dtype="float32",
                    donate_state=False, use_pallas=False,
                    bn_stats="per_shard")
        mesh = make_mesh((2, 4), ("data", "points"))
        real = jnp.array(rng.standard_normal((8, 64, 3)).astype(np.float32))
        state_u, step_u = self._mk(Config(mesh_shape=(2,), **base), sgd=True)
        state_s, step_s = self._mk(Config(**base), mesh, sgd=True)
        state_u, m_u = step_u(state_u, real)
        state_s, m_s = step_s(state_s, real)
        for key in m_u:
            np.testing.assert_allclose(float(m_u[key]), float(m_s[key]),
                                       rtol=2e-2, atol=1e-5, err_msg=key)
        for name, tree_u, tree_s in (
                ("d_stats", state_u.d_stats, state_s.d_stats),
                ("g_stats", state_u.g_stats, state_s.g_stats)):
            for a, b in zip(jax.tree_util.tree_leaves(tree_u),
                            jax.tree_util.tree_leaves(tree_s)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-3, atol=2e-5,
                                           err_msg=name)
        for name, tree_u, tree_s in (
                ("g_params", state_u.g_params, state_s.g_params),
                ("d_params", state_u.d_params, state_s.d_params)):
            for a, b in zip(jax.tree_util.tree_leaves(tree_u),
                            jax.tree_util.tree_leaves(tree_s)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-2, atol=1e-3,
                                           err_msg=name)

    def test_mix_matches_unsharded(self, rng):
        """--mix (CutMix) under point sharding: global-shaped lam/anchor/flip
        draws sliced per shard, psum-fetched anchor point, rank on gathered
        distances, sharded EMD alignment — must reproduce the unsharded
        CutMix losses."""
        from sp_gan_tpu.config import Config
        cfg = Config(np=64, bs=4, nk=8, nz=16, dtype="float32", mix=True,
                     donate_state=False, use_pallas=False)
        mesh = make_mesh((2, 4), ("data", "points"))
        real = jnp.array(rng.standard_normal((4, 64, 3)).astype(np.float32))
        state_u, step_u = self._mk(cfg, sgd=True)
        state_s, step_s = self._mk(cfg, mesh, sgd=True)
        state_u, m_u = step_u(state_u, real)
        state_s, m_s = step_s(state_s, real)
        for key in m_u:
            np.testing.assert_allclose(float(m_u[key]), float(m_s[key]),
                                       rtol=2e-4, atol=1e-6, err_msg=key)
        for a, b in zip(jax.tree_util.tree_leaves(state_u.d_params),
                        jax.tree_util.tree_leaves(state_s.d_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2, atol=1e-3)

    def test_wgan_gp_mapping_matches_unsharded(self, rng):
        """--gan wgan --gp_mapping under point sharding.

        What CAN be pinned tightly here is the penalty VALUE (inside
        d_loss): any two epsilon-optimal auction bijections give penalties
        within the N*eps bound, so d_loss agrees to ~1% — while a sharding
        bug (per-shard norm, or a norm missing the P_points
        cotangent-replication correction) is off 2-4x. What CANNOT be
        pinned is the one-step gradient/param trajectory: the pairing is a
        DISCRETE selection among many near-optimal bijections of the
        generator's clustered init clouds, and measurement showed the
        ~2e-6 fp shift between the two steps' differently-compiled G
        forwards legitimately flips ~4% of assignments (even the
        unsharded auction flips 10/256 pairs under a 2e-6 input shift;
        the sharded auction is bit-identical to the unsharded one on
        EQUAL inputs — see TestPointShardedEmd). The flipped pairs
        reroute the GP gradient, so post-step params diverge beyond any
        meaningful tolerance by chaos, not by error. Exact machinery
        equivalence (alphas, sharded pairing, P^2 norm correction,
        param-gradients) is pinned at 1e-6 with deterministic inputs in
        TestShardedWganGp below."""
        from sp_gan_tpu.config import Config
        cfg = Config(np=64, bs=4, nk=8, nz=16, dtype="float32", gan="wgan",
                     gp_mapping=True, gp_emd_iters=100,
                     donate_state=False, use_pallas=False)
        mesh = make_mesh((2, 4), ("data", "points"))
        real = jnp.array(rng.standard_normal((4, 64, 3)).astype(np.float32))
        state_u, step_u = self._mk(cfg, sgd=True)
        state_s, step_s = self._mk(cfg, mesh, sgd=True)
        state_u, m_u = step_u(state_u, real)
        state_s, m_s = step_s(state_s, real)
        np.testing.assert_allclose(float(m_u["d_loss"]), float(m_s["d_loss"]),
                                   rtol=2e-2, err_msg="d_loss")
        for key in m_s:
            assert np.isfinite(float(m_s[key])), key
        # params moved, and by the same order of magnitude (an SGD step
        # through EITHER valid pairing): guards against NaN/zero/blowup
        for p0, a, b in zip(
                jax.tree_util.tree_leaves(self._mk(cfg, sgd=True)[0].d_params),
                jax.tree_util.tree_leaves(state_u.d_params),
                jax.tree_util.tree_leaves(state_s.d_params)):
            du = np.abs(np.asarray(p0) - np.asarray(a)).max()
            ds = np.abs(np.asarray(p0) - np.asarray(b)).max()
            assert np.isfinite(ds)
            if du > 1e-5:
                assert ds < 10 * du + 1e-4

    def test_attn_matches_unsharded(self, rng):
        """--attn under point sharding: local queries vs all-gathered
        keys/values reproduce the dense N x N attention."""
        from sp_gan_tpu.config import Config
        cfg = Config(np=64, bs=4, nk=8, nz=16, dtype="float32", attn=True,
                     donate_state=False, use_pallas=False)
        mesh = make_mesh((2, 4), ("data", "points"))
        real = jnp.array(rng.standard_normal((4, 64, 3)).astype(np.float32))
        state_u, step_u = self._mk(cfg, sgd=True)
        state_s, step_s = self._mk(cfg, mesh, sgd=True)
        state_u, m_u = step_u(state_u, real)
        state_s, m_s = step_s(state_s, real)
        for key in m_u:
            np.testing.assert_allclose(float(m_u[key]), float(m_s[key]),
                                       rtol=2e-4, atol=1e-6, err_msg=key)

    @pytest.mark.skipif("not __import__('os').environ.get('SPGAN_BIG_TESTS')")
    def test_n16384_train_step(self, rng):
        """N=16384 training on the 8-virtual-device (2 data x 4 points)
        mesh (VERDICT r2 #2 done-criterion; ~2 min compile on CPU — run
        with SPGAN_BIG_TESTS=1; validated in-session r3, see BASELINE.md)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from sp_gan_tpu.config import Config
        from sp_gan_tpu.data import SyntheticDataset, sphere_template
        from sp_gan_tpu.train import create_train_state
        from sp_gan_tpu.train.step import make_train_step_pointsharded
        N = 16384
        cfg = Config(np=N, bs=2, nk=20, nz=128, mesh_shape=(2, 4),
                     mesh_axes=("data", "points"), donate_state=False,
                     use_pallas=False)
        mesh = make_mesh((2, 4), ("data", "points"))
        state, _, _, g_tx, d_tx = create_train_state(
            cfg, jax.random.PRNGKey(0))
        sphere = jnp.asarray(sphere_template(N))
        step = make_train_step_pointsharded(cfg, g_tx, d_tx, sphere, mesh)
        data = SyntheticDataset(n_items=2, n_points=N).data
        batch = jax.device_put(
            jnp.asarray(data), NamedSharding(mesh, P("data", "points", None)))
        state, m = step(state, batch)
        assert np.isfinite(float(m["d_loss"]))

    def test_sharded_sampler_matches_unsharded(self, rng):
        """make_sample_fn_pointsharded == make_sample_fn output (eval mode,
        BN running stats — exact up to fp)."""
        from sp_gan_tpu.config import Config
        from sp_gan_tpu.data import sphere_template
        from sp_gan_tpu.data.noise import sample_z
        from sp_gan_tpu.train import create_train_state
        from sp_gan_tpu.train.step import (make_sample_fn,
                                           make_sample_fn_pointsharded)
        cfg = Config(np=64, bs=4, nk=8, nz=16, dtype="float32",
                     donate_state=False, use_pallas=False)
        mesh = make_mesh((2, 4), ("data", "points"))
        state, G, _, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))
        sphere = jnp.asarray(sphere_template(cfg.np))
        f_u = make_sample_fn(cfg, G, sphere)
        f_s = make_sample_fn_pointsharded(cfg, sphere, mesh)
        z = sample_z(jax.random.PRNGKey(2), 4, cfg.np, cfg.nz, cfg.nv)
        np.testing.assert_allclose(np.asarray(f_u(state, z)),
                                   np.asarray(f_s(state, z)),
                                   rtol=1e-4, atol=2e-5)

    def test_trainer_on_2d_mesh(self, tmp_path):
        """Trainer picks the point-sharded step for a (data x points) mesh
        and completes an epoch."""
        from sp_gan_tpu.config import Config
        from sp_gan_tpu.data import SyntheticDataset
        from sp_gan_tpu.train import Trainer
        cfg = Config(np=32, bs=4, nk=8, nz=16, max_epoch=1, snapshot=1,
                     log_dir=str(tmp_path / "run"), donate_state=False,
                     mesh_shape=(2, 4), mesh_axes=("data", "points"),
                     use_pallas=False)
        tr = Trainer(cfg, dataset=SyntheticDataset(n_items=8, n_points=32))
        state = tr.train()
        assert int(state.step) == 2
        pcs = tr.generate(2)
        assert pcs.shape == (2, 32, 3) and np.all(np.isfinite(pcs))

    def test_trainer_on_2d_mesh_per_shard_bn(self, tmp_path):
        """Same CLI path with --bn_stats per_shard (the reference
        DataParallel BN semantics) — previously asserted off in the
        point-sharded step."""
        from sp_gan_tpu.config import Config
        from sp_gan_tpu.data import SyntheticDataset
        from sp_gan_tpu.train import Trainer
        cfg = Config(np=32, bs=4, nk=8, nz=16, max_epoch=1, snapshot=1,
                     log_dir=str(tmp_path / "run"), donate_state=False,
                     mesh_shape=(2, 4), mesh_axes=("data", "points"),
                     bn_stats="per_shard", use_pallas=False)
        tr = Trainer(cfg, dataset=SyntheticDataset(n_items=8, n_points=32))
        state = tr.train()
        assert int(state.step) == 2
        pcs = tr.generate(2)
        assert pcs.shape == (2, 32, 3) and np.all(np.isfinite(pcs))


class TestShardedWganGp:
    """wgan_gp with points_axis/data_axis vs the dense call — exact (1e-6)
    with deterministic toy discriminators, isolating the sharded-GP
    machinery (global-draw alpha slicing, the P_points^2 sum-of-squares
    normalization, sharded EMD pairing) from the GAN models' fp noise."""

    def _clouds(self, rng):
        real = jnp.array(rng.standard_normal((4, 64, 3)).astype(np.float32))
        fake = jnp.array(rng.standard_normal((4, 64, 3)).astype(np.float32))
        return real, fake

    @pytest.mark.parametrize("mapping", [False, True])
    def test_matches_dense(self, rng, mapping):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from sp_gan_tpu.losses.gp import wgan_gp

        real, fake = self._clouds(rng)
        key = jax.random.PRNGKey(7)

        # BN-like global batch stats + a nonlinearity: exercises both the
        # points-replicated cotangents AND cross-item stat coupling
        def d_dense(pts):
            mu = jnp.mean(pts, axis=(0, 1), keepdims=True)
            var = jnp.mean((pts - mu) ** 2, axis=(0, 1), keepdims=True)
            h = (pts - mu) / jnp.sqrt(var + 1e-5)
            return jnp.sum(jnp.tanh(h), axis=(1, 2))

        def d_local(pts):
            mu = jax.lax.pmean(jnp.mean(pts, axis=(0, 1), keepdims=True),
                               ("data", "points"))
            var = jax.lax.pmean(
                jnp.mean((pts - mu) ** 2, axis=(0, 1), keepdims=True),
                ("data", "points"))
            h = (pts - mu) / jnp.sqrt(var + 1e-5)
            return jax.lax.psum(jnp.sum(jnp.tanh(h), axis=(1, 2)), "points")

        gp_u = wgan_gp(d_dense, real, fake, key, 10.0, emd_pairing=mapping,
                       emd_iters=100)
        mesh = make_mesh((2, 4), ("data", "points"))

        def local(r, f):
            g = wgan_gp(d_local, r, f, key, 10.0, emd_pairing=mapping,
                        emd_iters=100, points_axis="points",
                        data_axis="data")
            return jax.lax.pmean(g, ("data", "points"))

        gp_s = shard_map(local, mesh=mesh,
                         in_specs=(P("data", "points", None),) * 2,
                         out_specs=P(), check_vma=False)(real, fake)
        np.testing.assert_allclose(float(gp_u), float(gp_s), rtol=1e-6)


class TestCombinedMesh:
    def test_data_and_points_axes(self, rng):
        """2D mesh: batch sharded over `data`, points over `points` — the
        full large-scale layout (dp x sp analog)."""
        import numpy as np
        from jax import shard_map
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


class TestPointShardedEmdProtocol:
    """Point-sharded metric-protocol EMD matrix == the unsharded lgan
    protocol (`eval.metrics.pairwise_emd_matrix`), via the mesh= passthrough
    and directly."""

    def test_matches_unsharded_protocol(self, mesh, rng):
        from sp_gan_tpu.eval.metrics import pairwise_emd_matrix
        from sp_gan_tpu.parallel.points import (
            pairwise_emd_matrix_pointsharded)

        gen = jnp.array(rng.standard_normal((3, 64, 3)).astype(np.float32))
        ref = jnp.array(rng.standard_normal((5, 64, 3)).astype(np.float32))

        m_u = pairwise_emd_matrix(gen, ref, eps=0.005, iters=5000,
                                  row_batch=2)
        m_s = pairwise_emd_matrix_pointsharded(gen, ref, mesh, eps=0.005,
                                               iters=5000, row_batch=2)
        m_p = pairwise_emd_matrix(gen, ref, eps=0.005, iters=5000,
                                  row_batch=2, mesh=mesh)
        assert m_u.shape == (3, 5)
        # entries agree to the solvers' shared N*eps optimality contract
        # (ulp-level fusion differences between the two wrappers can flip
        # a near-tie bid; see pairwise_emd_matrix_pointsharded docstring)
        np.testing.assert_allclose(m_s, m_u, rtol=1e-3)
        np.testing.assert_array_equal(m_p, m_s)
