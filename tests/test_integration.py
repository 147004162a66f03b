"""End-to-end integration: short synthetic training run -> generation ->
metric protocol -> manipulation. The CPU-runnable slice of BASELINE.json
configs[0] exercised as one flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_gan_tpu.config import Config
from sp_gan_tpu.data import SyntheticDataset, sphere_template
from sp_gan_tpu.eval import compute_all_metrics
from sp_gan_tpu.manipulate import Manipulator, region_mask
from sp_gan_tpu.train import create_train_state, make_train_step, make_sample_fn


@pytest.fixture(scope="module")
def trained():
    cfg = Config(np=32, bs=8, nk=8, nz=16, donate_state=False)
    ds = SyntheticDataset(n_items=32, n_points=32)
    state, G, D, g_tx, d_tx = create_train_state(cfg, jax.random.PRNGKey(0))
    sphere = jnp.asarray(sphere_template(cfg.np))
    step = make_train_step(cfg, G, D, g_tx, d_tx, sphere)
    rng = np.random.default_rng(0)
    metrics = None
    for _ in range(3):  # 3 epochs x 4 steps
        for batch in ds.epoch_batches(rng, cfg.bs):
            state, metrics = step(state, jnp.asarray(batch))
    return cfg, G, state, sphere, ds, metrics


class TestTrainingRun:
    def test_losses_finite_and_nonzero_steps(self, trained):
        cfg, G, state, sphere, ds, metrics = trained
        assert int(state.step) == 12
        for key in ("d_loss", "g_loss"):
            assert np.isfinite(float(metrics[key]))

    def test_discriminator_learns_something(self, trained):
        """After a few steps D should separate real/fake better than chance
        on the training data (tiny run: just check accuracy is sane)."""
        cfg, G, state, sphere, ds, metrics = trained
        acc = 0.5 * (float(metrics["real_acc"]) + float(metrics["fake_acc"]))
        assert 0.0 <= acc <= 1.0

    def test_generate_and_evaluate(self, trained):
        cfg, G, state, sphere, ds, _ = trained
        sample = make_sample_fn(cfg, G, sphere)
        z = 0.2 * jax.random.normal(jax.random.PRNGKey(3), (8, 1, cfg.nz))
        z = jnp.broadcast_to(z, (8, cfg.np, cfg.nz))
        gen = np.asarray(sample(state, z))
        assert np.all(np.isfinite(gen))
        m = compute_all_metrics(gen, ds.data[:8])
        assert set(m) == {"JSD", "jsd_scale", "COV-CD", "MMD-CD", "1NN-CD"}
        assert m["MMD-CD"] > 0

    def test_manipulation_from_trained_state(self, trained):
        cfg, G, state, sphere, ds, _ = trained
        man = Manipulator(cfg, state.g_params, state.g_stats)
        pcs = man.shape_interpolate(0, 1, steps=3)
        assert pcs.shape == (3, cfg.np, 3)
        mask = region_mask(man.ball, 0, cfg.np // 2)
        edited = man.part_edit(mask, seed=0, n_variants=1)
        assert edited.shape == (2, cfg.np, 3)
        # the edit must change the shape
        assert np.abs(edited[0] - edited[1]).max() > 1e-6
