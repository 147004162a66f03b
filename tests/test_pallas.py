"""Pallas kernels vs XLA twins (interpret mode on CPU; the same comparisons
run compiled on TPU via bench/kernels.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sp_gan_tpu.ops.pairwise import knn_indices, pairwise_sqdist


def run_interpret(fn, *args, **kw):
    with pltpu.force_tpu_interpret_mode():
        return fn(*args, **kw)


class TestKnnPallas:
    @pytest.mark.parametrize("shape", [(2, 64, 3), (1, 128, 8)])
    def test_matches_xla(self, rng, shape):
        from sp_gan_tpu.ops.pallas.knn import knn_pallas
        x = jnp.array(rng.standard_normal(shape).astype(np.float32))
        k = 5
        idx_p, dist_p = run_interpret(knn_pallas, x, k, tq=32)
        idx_x, dist_x = knn_indices(x, k, return_dists=True)
        # neighbor sets identical, ascending order both
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
        np.testing.assert_allclose(np.asarray(dist_p), np.asarray(dist_x),
                                   atol=1e-4)

    def test_excludes_self(self, rng):
        from sp_gan_tpu.ops.pallas.knn import knn_pallas
        x = jnp.array(rng.standard_normal((1, 64, 3)).astype(np.float32))
        idx, _ = run_interpret(knn_pallas, x, 4, tq=32)
        self_idx = np.arange(64)[None, :, None]
        assert not np.any(np.asarray(idx) == self_idx)


class TestChamferPallas:
    def test_matches_xla(self, rng):
        from sp_gan_tpu.ops.pallas.chamfer import chamfer_pallas
        x = jnp.array(rng.standard_normal((2, 64, 3)).astype(np.float32))
        y = jnp.array(rng.standard_normal((2, 96, 3)).astype(np.float32))
        d1, d2 = run_interpret(chamfer_pallas, x, y, tq=32)
        d = pairwise_sqdist(x, y)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(jnp.min(d, -1)),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(jnp.min(d, -2)),
                                   atol=1e-4)

    def test_asymmetric_sizes(self, rng):
        from sp_gan_tpu.ops.pallas.chamfer import chamfer_pallas
        x = jnp.array(rng.standard_normal((1, 32, 3)).astype(np.float32))
        y = jnp.array(rng.standard_normal((1, 128, 3)).astype(np.float32))
        d1, d2 = run_interpret(chamfer_pallas, x, y, tq=16)
        assert d1.shape == (1, 32) and d2.shape == (1, 128)
