"""Manipulation API tests: masks, z edits, and the full Manipulator surface
(the `visual.py` parity layer, SURVEY.md §3.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_gan_tpu.config import Config
from sp_gan_tpu.data import sphere_template
from sp_gan_tpu.manipulate import (
    Manipulator,
    blend_z,
    exchange_z,
    flip_z,
    half_space_mask,
    region_mask,
    replace_z,
)


@pytest.fixture(scope="module")
def man():
    cfg = Config(np=32, nk=8, nz=16)
    from sp_gan_tpu.nn import Generator
    G = Generator(cfg)
    x = jnp.zeros((1, cfg.np, 3))
    z = jnp.zeros((1, cfg.np, cfg.nz))
    gv = G.init(jax.random.PRNGKey(0), x, z, train=True)
    return Manipulator(cfg, gv["params"], gv["batch_stats"])


class TestMasks:
    def test_half_space_partition(self):
        ball = sphere_template(64)
        m_pos = half_space_mask(ball, axis=0, positive=True)
        m_neg = half_space_mask(ball, axis=0, positive=False)
        np.testing.assert_array_equal(m_pos + m_neg, 1)
        assert 10 < m_pos.sum() < 54  # roughly half

    def test_region_mask(self):
        ball = sphere_template(64)
        m = region_mask(ball, anchor=3, num=10)
        assert m.sum() == 10
        assert m[3] == 1  # anchor is its own nearest


class TestZEdits:
    def setup_method(self):
        k = jax.random.PRNGKey(0)
        self.z1 = jax.random.normal(k, (1, 8, 4))
        self.z2 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 4))
        self.mask = np.array([1, 1, 1, 1, 0, 0, 0, 0])

    def test_blend_endpoints(self):
        z0 = blend_z(self.z1, self.z2, self.mask, 0.0)
        np.testing.assert_allclose(np.asarray(z0), np.asarray(self.z1), atol=1e-6)
        z1 = np.asarray(blend_z(self.z1, self.z2, self.mask, 1.0))
        np.testing.assert_allclose(z1[0, :4], np.asarray(self.z2)[0, :4], atol=1e-6)
        np.testing.assert_allclose(z1[0, 4:], np.asarray(self.z1)[0, 4:], atol=1e-6)

    def test_replace(self):
        out = np.asarray(replace_z(self.z1, self.z2, self.mask))
        np.testing.assert_array_equal(out[0, :4], np.asarray(self.z2)[0, :4])
        np.testing.assert_array_equal(out[0, 4:], np.asarray(self.z1)[0, 4:])

    def test_flip(self):
        out = np.asarray(flip_z(self.z1, self.mask))
        np.testing.assert_array_equal(out[0, :4], -np.asarray(self.z1)[0, :4])
        np.testing.assert_array_equal(out[0, 4:], np.asarray(self.z1)[0, 4:])

    def test_exchange_symmetric(self):
        a, b = exchange_z(self.z1, self.z2, self.mask)
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_array_equal(a[0, :4], np.asarray(self.z2)[0, :4])
        np.testing.assert_array_equal(b[0, :4], np.asarray(self.z1)[0, :4])
        np.testing.assert_array_equal(a[0, 4:], np.asarray(self.z1)[0, 4:])


class TestManipulator:
    def test_generate(self, man):
        pcs = man.generate(3, seed=0)
        assert pcs.shape == (3, 32, 3)
        # normalized clouds
        r = np.linalg.norm(pcs, axis=-1).max(1)
        np.testing.assert_allclose(r, 1.0, atol=1e-3)

    def test_generate_scan_matches_loop(self, man):
        # 10 shapes at batch=4 -> 2 scanned full batches + remainder loop.
        # In-scan z sampling reuses the loop path's per-batch seeds, so a
        # wrong-seed bug would shift EVERY element by O(1); the scan body
        # being a separately-compiled XLA program, a sparse subset of
        # points may flip a kNN neighbor on near-tie distances (~1e-3).
        loop = man.generate(10, seed=5, batch=4, scan=False)
        scanned = man.generate(10, seed=5, batch=4, scan=True)
        diff = np.abs(scanned - loop)
        assert np.median(diff) < 1e-6, "bulk z-sampling diverged from loop"
        assert diff.max() < 2e-2, "scan output beyond tie-flip noise"

    def test_generate_scan_pow2_chunks(self, man):
        # 14 shapes at batch=4 -> t=3 full batches = pow2 chunks [2, 1]
        # (two scan dispatches) + one remainder loop batch of 2
        loop = man.generate(14, seed=3, batch=4, scan=False)
        scanned = man.generate(14, seed=3, batch=4, scan=True)
        assert scanned.shape == (14, loop.shape[1], 3)
        diff = np.abs(scanned - loop)
        assert np.median(diff) < 1e-6
        assert diff.max() < 2e-2

    def test_generate_bf16_wire(self, man):
        # wire_dtype only changes the fetch format of the scanned bulk
        # part: output is float32, values are the f32 scan result rounded
        # through bf16 (<= 2^-8 relative on unit-sphere coords), and the
        # remainder loop batch is untouched f32.
        f32 = man.generate(10, seed=7, batch=4, scan=True)
        bf = man.generate(10, seed=7, batch=4, scan=True,
                          wire_dtype="bfloat16")
        assert bf.dtype == np.float32
        assert bf.shape == f32.shape
        # scanned part (first 8): bf16 rounding of the same values
        np.testing.assert_allclose(bf[:8], f32[:8], atol=2 ** -8)
        assert np.abs(bf[:8] - f32[:8]).max() > 0, "cast was a no-op"
        # remainder loop batch (last 2): bit-identical f32 path
        np.testing.assert_array_equal(bf[8:], f32[8:])

    def test_generate_wire_dtype_validates(self, man):
        with pytest.raises(ValueError):
            man.generate(4, wire_dtype="float16")

    def test_generate_zero(self, man):
        pcs = man.generate(0)
        assert pcs.shape == (0, man.cfg.np, 3)

    def test_correspondence(self, man):
        pcs, colors = man.correspondence(2)
        assert colors.shape == pcs.shape
        assert colors.min() >= 0 and colors.max() <= 1

    def test_shape_interpolate_endpoints_differ(self, man):
        pcs = man.shape_interpolate(0, 1, steps=4)
        assert pcs.shape == (4, 32, 3)
        assert np.abs(pcs[0] - pcs[-1]).max() > 1e-4

    def test_part_interpolate_moves_only_part(self, man):
        mask = region_mask(man.ball, 0, 16)
        pcs = man.part_interpolate(mask, 0, 1, steps=3)
        assert pcs.shape == (3, 32, 3)

    def test_part_edit_keeps_unmasked_z_effect(self, man):
        mask = region_mask(man.ball, 0, 8)
        pcs = man.part_edit(mask, seed=0, n_variants=2)
        assert pcs.shape == (3, 32, 3)
        # variants differ from original
        assert np.abs(pcs[0] - pcs[1]).max() > 1e-5

    def test_part_flip_pairs(self, man):
        pcs = man.part_flip(axis=0, n=2)
        assert pcs.shape == (4, 32, 3)

    def test_part_exchange(self, man):
        mask = region_mask(man.ball, 0, 16)
        pcs = man.part_exchange(mask, 0, 1)
        assert pcs.shape == (4, 32, 3)

    def test_style_interpolate(self, man):
        """Style-space blending (Generator.py:216-232): alpha=0 reproduces
        shape A exactly; alpha=1 inside a full mask reproduces shape B."""
        mask = np.ones(32, np.int32)
        pcs = man.style_interpolate(mask, 0, 1, steps=3)
        assert pcs.shape == (3, 32, 3)
        za = man.sample_codes(1, 0)
        zb = man.sample_codes(1, 1)
        # jitted reference (style_interpolate is jitted; an eager G.apply
        # truncates the mixed_edge bf16 chain per-op while XLA keeps excess
        # precision under jit, so eager-vs-jit differs at ~1e-2)
        import jax as _jax
        fwd = _jax.jit(lambda v, x, z: man.G.apply(v, x, z, train=False))
        a_ref = np.asarray(fwd(man.variables, man.sphere[None], za))
        b_ref = np.asarray(fwd(man.variables, man.sphere[None], zb))
        np.testing.assert_allclose(pcs[0], a_ref[0], atol=1e-5)
        np.testing.assert_allclose(pcs[-1], b_ref[0], atol=1e-5)
        # partial mask at alpha=1 differs from both endpoints
        part = man.style_interpolate(half_space_mask(man.ball), 0, 1, steps=2)
        assert np.abs(part[1] - a_ref[0]).max() > 1e-5
        assert np.abs(part[1] - b_ref[0]).max() > 1e-5

    def test_part_interpolate_detail(self, man):
        shape_row, grid, masks = man.part_interpolate_detail(
            0, 1, alphas=(1.0, 0.5, 0.0), mask_sizes=(0, 16, 32),
            normalize=False)
        assert shape_row.shape == (3, 32, 3)
        assert grid.shape == (3, 3, 32, 3)
        assert masks.shape == (3, 32)
        np.testing.assert_array_equal(masks.sum(1), [0, 16, 32])
        # alpha=1 weights code A fully -> every mask column equals pure A;
        # mask_size=0 rows never blend -> also pure A
        base = grid[0, 0]
        for j in range(3):
            np.testing.assert_allclose(grid[0, j], base, atol=1e-6)
        np.testing.assert_allclose(grid[1, 0], base, atol=1e-6)
        np.testing.assert_allclose(grid[2, 0], base, atol=1e-6)
        # full-mask alpha=0 row equals pure B = shape_row alpha=0 entry
        np.testing.assert_allclose(grid[2, 2], shape_row[2], atol=1e-5)

    def test_sample_codes_follow_n_rand(self):
        cfg = Config(np=16, nk=8, nz=8, n_rand=True)
        from sp_gan_tpu.nn import Generator
        import jax.numpy as jnp
        G = Generator(cfg)
        gv = G.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 3)),
                    jnp.zeros((1, 16, 8)), train=True)
        m = Manipulator(cfg, gv["params"], gv["batch_stats"])
        z = np.asarray(m.sample_codes(2, 0))
        # per-point iid: rows differ within a shape (model.py:125-131)
        assert np.abs(z[0, 0] - z[0, 1]).max() > 1e-6

    def test_same_z_same_shape(self, man):
        """Determinism of the eval-mode forward over the fixed sphere."""
        a = man.shape_interpolate(0, 1, steps=2)
        b = man.shape_interpolate(0, 1, steps=2)
        np.testing.assert_array_equal(a, b)


class TestTemplateOrdering:
    def test_reference_template_path_preserves_order(self, tmp_path):
        """Masks are defined over template ordering; loading an external
        .xyz must preserve row order (manipulation parity with reference
        checkpoints depends on it)."""
        import numpy as np
        from sp_gan_tpu.data import sphere_template
        rng = np.random.default_rng(0)
        ball = rng.standard_normal((64, 3)).astype(np.float32)
        p = str(tmp_path / "64.xyz")
        np.savetxt(p, ball, fmt="%.6f")
        loaded = sphere_template(64, path=p)
        # normalization preserves ordering: nearest original row per loaded
        # row must be the same index
        from sp_gan_tpu.data.sphere import pc_normalize
        np.testing.assert_allclose(loaded, pc_normalize(ball), atol=1e-5)
