"""CutMix tests: mask structure, mixing content, soft labels, and the wired
D-step path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_gan_tpu.losses import cutmix


class TestCutMix:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.real = jnp.array(rng.uniform(-1, 1, (4, 32, 3)).astype(np.float32))
        self.fake = jnp.array(rng.uniform(-1, 1, (4, 32, 3)).astype(np.float32))

    def test_shapes(self):
        mixed, map_s, mask = cutmix(jax.random.PRNGKey(0), self.real,
                                    self.fake, emd_iters=20)
        assert mixed.shape == (4, 32, 3)
        assert map_s.shape == (4,)
        assert mask.shape == (4, 32)

    def test_mask_binary_and_label_consistent(self):
        _, map_s, mask = cutmix(jax.random.PRNGKey(1), self.real, self.fake,
                                emd_iters=20)
        m = np.asarray(mask)
        assert set(np.unique(m).tolist()).issubset({0.0, 1.0})
        np.testing.assert_allclose(np.asarray(map_s), m.mean(-1), atol=1e-6)

    def test_kept_points_are_real(self):
        mixed, _, mask = cutmix(jax.random.PRNGKey(2), self.real, self.fake,
                                emd_iters=20)
        mixed, mask = np.asarray(mixed), np.asarray(mask)
        real = np.asarray(self.real)
        keep = mask[..., None].astype(bool)
        np.testing.assert_allclose(mixed[keep[..., 0]], real[keep[..., 0]],
                                   atol=1e-6)

    def test_replaced_points_come_from_fake(self):
        mixed, _, mask = cutmix(jax.random.PRNGKey(3), self.real, self.fake,
                                emd_iters=20)
        mixed, mask = np.asarray(mixed), np.asarray(mask)
        fake = np.asarray(self.fake)
        for b in range(4):
            repl = mixed[b][mask[b] == 0]
            fk = set(map(tuple, np.round(fake[b], 5)))
            for p in np.round(repl, 5):
                assert tuple(p) in fk

    def test_mix_wired_step(self):
        from tests.test_train_step import tiny_cfg, build, leaves_differ
        from sp_gan_tpu.data import SyntheticDataset
        cfg = tiny_cfg(mix=True, mix_emd_iters=10)
        state, G, D, step, sphere = build(cfg)
        real = jnp.asarray(SyntheticDataset(n_items=4, n_points=32).data[:4])
        new_state, metrics = step(state, real)
        assert np.isfinite(float(metrics["d_loss"]))
        assert leaves_differ(state.d_params, new_state.d_params)
