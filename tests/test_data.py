"""Data-layer tests: sphere templates, synthetic/H5 datasets, augmentation,
noise sampling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_gan_tpu.data import (
    H5Dataset,
    SyntheticDataset,
    augment_batch,
    fibonacci_sphere,
    normalize_point_cloud,
    pc_normalize,
    sample_z,
    sphere_sqdist,
    sphere_template,
)
from sp_gan_tpu.data.augment import rotate_y_batch, shuffle_points_batch
from sp_gan_tpu.data.noise import masked_z


class TestSphere:
    def test_fibonacci_uniform(self):
        pts = fibonacci_sphere(512)
        assert pts.shape == (512, 3)
        np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-5)
        # near-uniform: mean close to origin
        assert np.abs(pts.mean(0)).max() < 0.02

    def test_template_normalized(self):
        ball = sphere_template(256)
        assert ball.shape == (256, 3)
        assert np.linalg.norm(ball, axis=1).max() == pytest.approx(1.0, abs=1e-5)

    def test_template_deterministic(self):
        np.testing.assert_array_equal(sphere_template(128), sphere_template(128))

    def test_sqdist(self):
        ball = sphere_template(64)
        d = sphere_sqdist(ball)
        assert d.shape == (64, 64)
        np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-5)

    def test_load_xyz_roundtrip(self, tmp_path):
        ball = fibonacci_sphere(128)
        p = str(tmp_path / "ball.xyz")
        np.savetxt(p, ball)
        loaded = sphere_template(128, path=p)
        np.testing.assert_allclose(loaded, pc_normalize(ball), atol=1e-5)


class TestDatasets:
    def test_synthetic_shapes(self):
        ds = SyntheticDataset(n_items=16, n_points=64)
        assert ds.data.shape == (16, 64, 3)
        # normalized: max radius 1 per cloud
        r = np.linalg.norm(ds.data, axis=-1).max(axis=1)
        np.testing.assert_allclose(r, 1.0, atol=1e-4)

    def test_synthetic_multiclass(self):
        from sp_gan_tpu.data import SyntheticMultiClassDataset

        ds = SyntheticMultiClassDataset(n_items=12, n_points=256, seed=0)
        assert ds.data.shape == (12, 256, 3)
        assert list(ds.labels) == [0, 1, 2] * 4
        r = np.linalg.norm(ds.data, axis=-1).max(axis=1)
        np.testing.assert_allclose(r, 1.0, atol=1e-4)
        # classes are geometrically distinguishable: mean chamfer within a
        # class is well below the cross-class distance (tori have a hole,
        # boxes have flat faces)
        d2 = ((ds.data[:, None, :, None, :]
               - ds.data[None, :, None, :, :]) ** 2).sum(-1)
        cd = d2.min(2).mean(-1) + d2.min(3).mean(-1)      # [12, 12]
        same = np.equal.outer(ds.labels, ds.labels)
        off = ~np.eye(12, dtype=bool)
        assert cd[same & off].mean() < 0.5 * cd[~same].mean()
        # deterministic in seed
        ds2 = SyntheticMultiClassDataset(n_items=12, n_points=256, seed=0)
        np.testing.assert_array_equal(ds.data, ds2.data)

    def test_epoch_batches(self):
        ds = SyntheticDataset(n_items=10, n_points=32)
        rng = np.random.default_rng(0)
        batches = list(ds.epoch_batches(rng, bs=4))
        assert len(batches) == 2  # drop_last
        assert batches[0].shape == (4, 32, 3)

    def test_h5_roundtrip(self, tmp_path):
        import h5py
        d = str(tmp_path / "64")
        os.makedirs(d)
        data = np.random.default_rng(0).standard_normal((6, 64, 3)).astype(np.float32)
        with h5py.File(os.path.join(d, "chair.h5"), "w") as f:
            f.create_dataset("poisson_64", data=data)
        ds = H5Dataset(str(tmp_path), "Chair", n_points=64)
        assert ds.data.shape == (6, 64, 3)
        r = np.linalg.norm(ds.data, axis=-1).max(axis=1)
        np.testing.assert_allclose(r, 1.0, atol=1e-4)

    def test_h5_scale(self, tmp_path):
        import h5py
        d = str(tmp_path / "32")
        os.makedirs(d)
        data = np.random.default_rng(0).standard_normal((4, 32, 3)).astype(np.float32)
        with h5py.File(os.path.join(d, "chair.h5"), "w") as f:
            f.create_dataset("poisson_32", data=data)
        ds = H5Dataset(str(tmp_path), "Chair", n_points=32, scale=0.5)
        r = np.linalg.norm(ds.data, axis=-1).max(axis=1)
        np.testing.assert_allclose(r, 0.5, atol=1e-4)


class TestAugment:
    def test_normalize(self, rng):
        pc = rng.standard_normal((4, 32, 3)).astype(np.float32) * 5 + 2
        out = np.asarray(normalize_point_cloud(jnp.array(pc)))
        r = np.linalg.norm(out, axis=-1).max(axis=1)
        np.testing.assert_allclose(r, 1.0, atol=1e-4)
        np.testing.assert_allclose(out.mean(1), 0.0, atol=0.5)

    def test_rotation_preserves_norms_and_y(self, rng):
        pc = jnp.array(rng.standard_normal((2, 16, 3)).astype(np.float32))
        out = rotate_y_batch(jax.random.PRNGKey(0), pc)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(pc), axis=-1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out)[..., 1],
                                   np.asarray(pc)[..., 1], atol=1e-5)

    def test_augment_scale_range(self, rng):
        pc = jnp.array(rng.standard_normal((8, 16, 3)).astype(np.float32))
        out = augment_batch(jax.random.PRNGKey(1), pc, True)
        ratio = (np.linalg.norm(np.asarray(out), axis=-1)
                 / (np.linalg.norm(np.asarray(pc), axis=-1) + 1e-9))
        assert ratio.min() > 0.79 and ratio.max() < 1.26

    def test_shuffle_preserves_set(self, rng):
        pc = jnp.array(rng.standard_normal((2, 16, 3)).astype(np.float32))
        out = np.asarray(shuffle_points_batch(jax.random.PRNGKey(2), pc))
        for b in range(2):
            a = set(map(tuple, np.round(np.asarray(pc)[b], 5)))
            o = set(map(tuple, np.round(out[b], 5)))
            assert a == o


class TestNoise:
    def test_tiled_default(self):
        z = sample_z(jax.random.PRNGKey(0), 4, 32, 16, sigma=0.2)
        z = np.asarray(z)
        assert z.shape == (4, 32, 16)
        # tiled: identical across points
        np.testing.assert_array_equal(z[:, 0], z[:, 5])
        assert 0.05 < z.std() < 0.5

    def test_n_rand(self):
        z = np.asarray(sample_z(jax.random.PRNGKey(0), 4, 32, 16, n_rand=True))
        assert not np.array_equal(z[:, 0], z[:, 5])

    def test_n_mix_structure(self):
        ball = sphere_template(32)
        d = jnp.asarray(sphere_sqdist(ball))
        # find a key whose gate fires
        for s in range(10):
            z = np.asarray(sample_z(jax.random.PRNGKey(s), 2, 32, 8,
                                    n_mix=True, ball_sqdist=d))
            ncodes = len(np.unique(np.round(z[0, :, 0], 6)))
            if ncodes == 2:
                break
        assert ncodes in (1, 2)  # one or two region codes, never noise soup

    def test_n_mix_sphere_rows_match_matrix(self):
        """sample_z(sphere=...) computes the anchor distance rows on the
        fly — identical codes to the precomputed [N, N] matrix path (which
        is 1 GB at N=16384; the row form scales)."""
        ball = sphere_template(32)
        d = jnp.asarray(sphere_sqdist(ball))
        for s in range(4):
            za = np.asarray(sample_z(jax.random.PRNGKey(s), 2, 32, 8,
                                     n_mix=True, ball_sqdist=d))
            zb = np.asarray(sample_z(jax.random.PRNGKey(s), 2, 32, 8,
                                     n_mix=True,
                                     sphere=jnp.asarray(ball)))
            np.testing.assert_allclose(za, zb, atol=1e-6)

    def test_masked_z(self):
        masks = jnp.array([[0] * 16 + [1] * 16])
        z = np.asarray(masked_z(jax.random.PRNGKey(0), masks, nz=8))
        assert z.shape == (1, 32, 8)
        np.testing.assert_array_equal(z[0, 0], z[0, 15])
        assert not np.array_equal(z[0, 0], z[0, 16])


class TestExtraAugment:
    def test_jitter_bounded(self, rng):
        from sp_gan_tpu.data.augment import jitter_batch
        pc = jnp.array(rng.standard_normal((2, 32, 3)).astype(np.float32))
        out = jitter_batch(jax.random.PRNGKey(0), pc, sigma=0.01, clip=0.02)
        assert np.abs(np.asarray(out - pc)).max() <= 0.02 + 1e-6

    def test_translate_per_cloud(self, rng):
        from sp_gan_tpu.data.augment import translate_batch
        pc = jnp.array(rng.standard_normal((2, 32, 3)).astype(np.float32))
        out = translate_batch(jax.random.PRNGKey(1), pc, 0.1)
        d = np.asarray(out - pc)
        # constant shift per cloud
        np.testing.assert_allclose(d, np.broadcast_to(d[:, :1, :], d.shape), atol=1e-5)
        assert np.abs(d).max() <= 0.1

    def test_rotate_perturbation_preserves_norms(self, rng):
        from sp_gan_tpu.data.augment import rotate_perturbation_batch
        pc = jnp.array(rng.standard_normal((2, 32, 3)).astype(np.float32))
        out = rotate_perturbation_batch(jax.random.PRNGKey(2), pc)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                                   np.linalg.norm(np.asarray(pc), axis=-1),
                                   atol=1e-4)

    def test_dropout_replaces_with_first(self, rng):
        from sp_gan_tpu.data.augment import random_point_dropout
        pc = jnp.array(rng.standard_normal((2, 64, 3)).astype(np.float32))
        out = np.asarray(random_point_dropout(jax.random.PRNGKey(3), pc))
        pcn = np.asarray(pc)
        for b in range(2):
            for n in range(64):
                ok = np.allclose(out[b, n], pcn[b, n]) or \
                    np.allclose(out[b, n], pcn[b, 0])
                assert ok
