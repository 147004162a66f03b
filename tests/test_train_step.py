"""End-to-end train-step tests: one fused G+D step on tiny shapes
(the CPU-runnable slice of BASELINE.json configs[0]), plus checkpoint
roundtrip and the multi-device data-parallel path on the virtual 8-CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_gan_tpu.config import Config
from sp_gan_tpu.data import SyntheticDataset, sphere_template
from sp_gan_tpu.parallel import make_mesh, shard_batch
from sp_gan_tpu.train import create_train_state, make_train_step, make_sample_fn
from sp_gan_tpu.train.checkpoint import save_checkpoint, load_checkpoint, \
    latest_checkpoint
from sp_gan_tpu.train.state import make_optimizers


def tiny_cfg(**kw):
    base = dict(np=32, bs=4, nk=8, nz=16, max_epoch=1, donate_state=False)
    base.update(kw)
    return Config(**base)


def build(cfg, mesh=None):
    state, G, D, g_tx, d_tx = create_train_state(cfg, jax.random.PRNGKey(0))
    sphere = jnp.asarray(sphere_template(cfg.np))
    step = make_train_step(cfg, G, D, g_tx, d_tx, sphere, mesh=mesh)
    return state, G, D, step, sphere


def leaves_differ(a, b):
    return any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


@pytest.fixture(scope="module")
def real_batch():
    ds = SyntheticDataset(n_items=8, n_points=32)
    return jnp.asarray(ds.data[:4])


class TestSingleStep:
    def test_step_updates_both_nets(self, real_batch):
        cfg = tiny_cfg()
        state, G, D, step, sphere = build(cfg)
        new_state, metrics = step(state, real_batch)
        assert leaves_differ(state.g_params, new_state.g_params)
        assert leaves_differ(state.d_params, new_state.d_params)
        assert int(new_state.step) == 1
        for k in ("d_loss", "g_loss", "real_acc", "fake_acc"):
            assert np.isfinite(float(metrics[k])), k

    def test_two_steps_progress(self, real_batch):
        cfg = tiny_cfg()
        state, G, D, step, sphere = build(cfg)
        s1, m1 = step(state, real_batch)
        s2, m2 = step(s1, real_batch)
        assert int(s2.step) == 2
        assert leaves_differ(s1.g_params, s2.g_params)

    def test_wgan_gp_step(self, real_batch):
        cfg = tiny_cfg(gan="wgan", lambda_gp=10.0)
        state, G, D, step, sphere = build(cfg)
        new_state, metrics = step(state, real_batch)
        assert np.isfinite(float(metrics["d_loss"]))
        assert leaves_differ(state.d_params, new_state.d_params)

    @pytest.mark.parametrize("gan", ["hinge", "gan", "real"])
    def test_other_objectives(self, real_batch, gan):
        cfg = tiny_cfg(gan=gan)
        state, G, D, step, sphere = build(cfg)
        _, metrics = step(state, real_batch)
        assert np.isfinite(float(metrics["d_loss"]))

    def test_ema_tracks(self, real_batch):
        cfg = tiny_cfg(ema=True, ema_rate=0.5)
        state, G, D, step, sphere = build(cfg)
        s1, _ = step(state, real_batch)
        assert s1.g_ema is not None
        assert leaves_differ(s1.g_ema, state.g_ema)
        # EMA should lag behind raw params
        assert leaves_differ(s1.g_ema, s1.g_params)

    def test_determinism(self, real_batch):
        cfg = tiny_cfg()
        state, G, D, step, sphere = build(cfg)
        a, ma = step(state, real_batch)
        b, mb = step(state, real_batch)
        np.testing.assert_allclose(float(ma["d_loss"]), float(mb["d_loss"]))
        leaves_a = jax.tree_util.tree_leaves(a.g_params)
        leaves_b = jax.tree_util.tree_leaves(b.g_params)
        for la, lb in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


class TestSampling:
    def test_sample_fn(self):
        cfg = tiny_cfg()
        state, G, D, step, sphere = build(cfg)
        sample = make_sample_fn(cfg, G, sphere)
        z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.np, cfg.nz)) * 0.2
        out = sample(state, z)
        assert out.shape == (2, cfg.np, 3)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_sample_fn_matches_plain_eval_forward(self):
        """The sampler's default path is the plain eval graph (fused_eval is
        opt-in since the diff-only kNN kernel made the plain graph faster);
        pin its output to a direct G.apply(train=False)."""
        cfg = tiny_cfg()
        assert cfg.fused_eval is False
        state, G, D, step, sphere = build(cfg)
        sample = make_sample_fn(cfg, G, sphere)
        z = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.np, cfg.nz)) * 0.2
        out = sample(state, z)
        x = jnp.broadcast_to(sphere[None], (2,) + sphere.shape)
        # compare against the jitted plain forward with the same static
        # options the sampler uses (template_batch_const B=1 edge1):
        # eager-vs-jit differ at ~4e-2 under mixed_edge (bf16 edge internals
        # contract differently outside XLA fusion) — both are the same
        # program, the sampler must match the jitted one bit-for-bit
        ref = jax.jit(lambda v, xx, zz: G.apply(
            v, xx, zz, train=False, template_batch_const=cfg.edge1_b1))(
            {"params": state.g_params, "batch_stats": state.g_stats}, x, z)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, real_batch):
        cfg = tiny_cfg()
        state, G, D, step, sphere = build(cfg)
        state, _ = step(state, real_batch)
        path = save_checkpoint(str(tmp_path), state, epoch=7, cfg=cfg)
        assert latest_checkpoint(str(tmp_path)) == path

        template, *_ = build(cfg)
        restored, epoch = load_checkpoint(path, template)
        assert epoch == 7
        for a, b in zip(jax.tree_util.tree_leaves(state.g_params),
                        jax.tree_util.tree_leaves(restored.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer state (both G and D — unlike the reference, which drops
        # D's optimizer on restore) survives
        for a, b in zip(jax.tree_util.tree_leaves(state.d_opt),
                        jax.tree_util.tree_leaves(restored.d_opt)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_from_checkpoint_ema(self, tmp_path, real_batch):
        # from_checkpoint(use_ema=True) must serve the EMA weights, not the
        # raw ones (and refuse when the run recorded none)
        from sp_gan_tpu.manipulate import from_checkpoint

        cfg = tiny_cfg(ema=True)
        state, G, D, step, sphere = build(cfg)
        state, _ = step(state, real_batch)   # raw and EMA now differ
        assert leaves_differ(state.g_params, state.g_ema)
        path = save_checkpoint(str(tmp_path), state, epoch=1, cfg=cfg)

        man_raw = from_checkpoint(path, cfg)
        man_ema = from_checkpoint(path, cfg, use_ema=True)
        for got, want in ((man_raw.variables["params"], state.g_params),
                          (man_ema.variables["params"], state.g_ema)):
            for a, b in zip(jax.tree_util.tree_leaves(got),
                            jax.tree_util.tree_leaves(want)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        cfg_no = tiny_cfg(ema=False)
        s2, *_ = build(cfg_no)
        p2 = save_checkpoint(str(tmp_path / "no_ema"), s2, epoch=1, cfg=cfg_no)
        with pytest.raises(ValueError, match="EMA"):
            from_checkpoint(p2, cfg_no, use_ema=True)

    def test_resume_continues(self, tmp_path, real_batch):
        cfg = tiny_cfg()
        state, G, D, step, sphere = build(cfg)
        s1, _ = step(state, real_batch)
        save_checkpoint(str(tmp_path), s1, epoch=1, cfg=cfg)
        template, *_ = build(cfg)
        restored, _ = load_checkpoint(latest_checkpoint(str(tmp_path)), template)
        s2, m = step(restored, real_batch)
        assert int(s2.step) == 2
        assert np.isfinite(float(m["g_loss"]))


class TestDataParallel:
    def test_eight_device_mesh_step(self):
        """The dryrun_multichip path: 8 virtual CPU devices, batch sharded
        over `data`, params replicated."""
        assert jax.device_count() >= 8, "conftest must provide 8 cpu devices"
        cfg = tiny_cfg(bs=8, mesh_shape=(8,))
        mesh = make_mesh((8,), ("data",))
        state, G, D, step, sphere = build(cfg, mesh=mesh)
        ds = SyntheticDataset(n_items=8, n_points=cfg.np)
        batch = shard_batch(mesh, jnp.asarray(ds.data[:8]))
        new_state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["d_loss"]))
        assert leaves_differ(state.g_params, new_state.g_params)

    def test_sharded_matches_single_device(self):
        """Data-parallel step == single-device step on the same batch (up to
        fp reassociation) — BatchNorm uses per-shard stats so exact equality
        isn't expected; losses should still be close on near-iid shards."""
        cfg = tiny_cfg(bs=8, mesh_shape=(8,))
        mesh = make_mesh((8,), ("data",))
        ds = SyntheticDataset(n_items=8, n_points=cfg.np)
        batch = jnp.asarray(ds.data[:8])

        state1, G, D, step1, sphere = build(cfg)
        _, m1 = step1(state1, batch)

        state8, G8, D8, step8, _ = build(cfg, mesh=mesh)
        _, m8 = step8(state8, shard_batch(mesh, batch))
        # same init seed -> identical params; same z draw; only BN sharding
        # differs. Losses should be in the same ballpark.
        assert abs(float(m1["d_loss"]) - float(m8["d_loss"])) < 0.5


class TestNanGuard:
    def test_nonfinite_grads_skip_update(self, real_batch):
        """With nan_guard, poisoned input producing non-finite grads must
        leave params unchanged rather than propagate NaNs."""
        cfg = tiny_cfg(nan_guard=True)
        state, G, D, step, sphere = build(cfg)
        bad = real_batch.at[0, 0, 0].set(jnp.nan)
        new_state, metrics = step(state, bad)
        # D saw NaN real data -> non-finite d grads -> D params unchanged
        for a, b in zip(jax.tree_util.tree_leaves(state.d_params),
                        jax.tree_util.tree_leaves(new_state.d_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_clean_input_still_updates(self, real_batch):
        cfg = tiny_cfg(nan_guard=True)
        state, G, D, step, sphere = build(cfg)
        new_state, _ = step(state, real_batch)
        assert leaves_differ(state.d_params, new_state.d_params)
        assert leaves_differ(state.g_params, new_state.g_params)
