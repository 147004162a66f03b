"""BatchNorm sharding semantics (VERDICT r1 #5): the default is GLOBAL batch
statistics (GSPMD sync-BN); cfg.bn_stats="per_shard" reproduces the
reference DataParallel's per-replica statistics (model.py:79-84). These
tests distinguish the two numerically and check the sharded execution
matches the unsharded math (GSPMD full-array semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_gan_tpu.config import Config
from sp_gan_tpu.nn.layers import SPBatchNorm


def _init_and_apply(bn, x, train=True):
    v = bn.init(jax.random.PRNGKey(0), x, train)
    y, mut = bn.apply(v, x, train, mutable=["batch_stats"])
    return np.asarray(y), {k: np.asarray(w)
                           for k, w in mut["batch_stats"].items()}


class TestGroupsMath:
    def setup_method(self):
        rng = np.random.default_rng(0)
        # two groups with very different means so the modes can't coincide
        g0 = rng.standard_normal((4, 16, 8)).astype(np.float32)
        g1 = rng.standard_normal((4, 16, 8)).astype(np.float32) + 5.0
        self.x = jnp.asarray(np.concatenate([g0, g1]))

    def test_global_equals_whole_batch_stats(self):
        y, stats = _init_and_apply(SPBatchNorm(), self.x)
        xf = np.asarray(self.x)
        mean = xf.mean((0, 1))
        var = xf.var((0, 1))
        ref = (xf - mean) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(y, ref, atol=1e-4)
        # running stats track the whole batch
        np.testing.assert_allclose(stats["mean"], 0.1 * mean, atol=1e-5)

    def test_per_shard_normalizes_each_group_by_its_own_stats(self):
        y, stats = _init_and_apply(SPBatchNorm(groups=2), self.x)
        xf = np.asarray(self.x)
        for g in range(2):
            part = xf[4 * g:4 * (g + 1)]
            mean = part.mean((0, 1))
            var = part.var((0, 1))
            ref = (part - mean) / np.sqrt(var + 1e-5)
            np.testing.assert_allclose(y[4 * g:4 * (g + 1)], ref, atol=1e-4,
                                       err_msg=f"group {g}")
        # running stats track group 0 (torch DataParallel keeps replica 0's
        # buffers)
        m0 = xf[:4].mean((0, 1))
        np.testing.assert_allclose(stats["mean"], 0.1 * m0, atol=1e-5)

    def test_modes_differ_numerically(self):
        y_g, _ = _init_and_apply(SPBatchNorm(), self.x)
        y_p, _ = _init_and_apply(SPBatchNorm(groups=2), self.x)
        # the group means differ by 5 sigma; outputs must visibly diverge
        assert np.abs(y_g - y_p).max() > 0.5

    def test_eval_mode_ignores_groups(self):
        bn = SPBatchNorm(groups=2)
        v = bn.init(jax.random.PRNGKey(0), self.x, True)
        y1 = np.asarray(bn.apply(v, self.x, False))
        y2 = np.asarray(SPBatchNorm().apply(v, self.x, False))
        np.testing.assert_allclose(y1, y2, atol=1e-6)


class TestShardedExecution:
    def test_per_shard_on_mesh_matches_unsharded(self):
        """Jitted with the batch sharded over 8 devices, per_shard BN output
        equals the single-device evaluation (full-array semantics), and the
        group reductions stay shard-local (no cross-shard stats)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        n = 8
        if jax.device_count() < n:
            pytest.skip("needs 8 devices")
        mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((16, 8, 8)).astype(np.float32)
                        + np.arange(16, dtype=np.float32)[:, None, None])
        bn = SPBatchNorm(groups=n)
        v = bn.init(jax.random.PRNGKey(0), x, True)
        ref = np.asarray(bn.apply(v, x, True, mutable=["batch_stats"])[0])
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        y, _ = jax.jit(lambda v, x: bn.apply(v, x, True,
                                             mutable=["batch_stats"]))(v, xs)
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)

    def test_train_step_modes_produce_different_d_stats(self):
        """End-to-end distinguisher (the r1 test's 0.5 tolerance caught
        nothing): the discriminator's BN running stats after one step differ
        between global and per_shard when shard contents differ."""
        from jax.sharding import Mesh
        from sp_gan_tpu.data import sphere_template
        from sp_gan_tpu.parallel import make_mesh, shard_batch
        from sp_gan_tpu.train import create_train_state, make_train_step
        n = 8
        if jax.device_count() < n:
            pytest.skip("needs 8 devices")
        rng = np.random.default_rng(2)
        batch = rng.standard_normal((16, 32, 3)).astype(np.float32)
        batch[8:] *= 3.0  # make shard statistics differ
        sphere = jnp.asarray(sphere_template(32))

        stats = {}
        for mode in ("global", "per_shard"):
            cfg = Config(np=32, bs=16, nk=8, nz=16, mesh_shape=(n,),
                         bn_stats=mode, donate_state=False)
            mesh = make_mesh((n,), ("data",))
            state, G, D, g_tx, d_tx = create_train_state(
                cfg, jax.random.PRNGKey(0))
            step = make_train_step(cfg, G, D, g_tx, d_tx, sphere, mesh=mesh)
            new_state, _ = step(state, shard_batch(mesh, jnp.asarray(batch)))
            stats[mode] = np.asarray(new_state.d_stats["bn1"]["var"])
        diff = np.abs(stats["global"] - stats["per_shard"]).max()
        assert diff > 1e-4, f"modes indistinguishable (diff {diff})"
