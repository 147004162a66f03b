"""Fused train-mode EdgeBlock vs the flax EdgeBlock (train=True), interpret
mode on CPU: batch statistics and outputs must match exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sp_gan_tpu.config import Config
from sp_gan_tpu.nn.layers import EdgeBlock
from sp_gan_tpu.ops import edge_features
from sp_gan_tpu.ops.pairwise import knn_indices


@pytest.fixture(scope="module")
def setup():
    B, N, C, F, k = 2, 64, 6, 16, 4
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, C))
    blk = EdgeBlock(C, F, k)
    variables = blk.init(jax.random.PRNGKey(1), x, True)
    idx = knn_indices(x, k)
    ee = edge_features(x, k, idx=idx)
    return blk, variables, x, idx, ee, k, F


def flax_forward(blk, variables, x, idx):
    out, mut = blk.apply(variables, x, True, idx, mutable=["batch_stats"])
    return out, mut["batch_stats"]


class TestFusedTrainForward:
    def test_stats_match_flax(self, setup):
        """Batch mean/var of all three BNs == values flax computes (recovered
        from the running-average update with momentum m: ra' = m*ra +
        (1-m)*batch, ra starts at (0,1))."""
        from sp_gan_tpu.ops.pallas.edgeblock_train import edge_block_train_stats
        blk, variables, x, idx, ee, k, F = setup
        _, new_stats = flax_forward(blk, variables, x, idx)
        with pltpu.force_tpu_interpret_mode():
            stats = edge_block_train_stats(variables["params"], ee, k)
        m = 0.9
        for bn in ("bn_w1", "bn_w2", "bn_x"):
            ra_mean = np.asarray(new_stats[bn]["mean"])
            ra_var = np.asarray(new_stats[bn]["var"])
            batch_mean = ra_mean / (1 - m)                 # ra started at 0
            batch_var = (ra_var - m * 1.0) / (1 - m)       # ra started at 1
            got_mean, got_var = map(np.asarray, stats[bn])
            np.testing.assert_allclose(got_mean, batch_mean, atol=1e-4,
                                       err_msg=f"{bn} mean")
            np.testing.assert_allclose(got_var, batch_var, atol=1e-3,
                                       err_msg=f"{bn} var")

    def test_output_matches_flax(self, setup):
        from sp_gan_tpu.ops.pallas.edgeblock_train import (
            edge_block_train_forward)
        blk, variables, x, idx, ee, k, F = setup
        ref, _ = flax_forward(blk, variables, x, idx)
        with pltpu.force_tpu_interpret_mode():
            out, _ = edge_block_train_forward(variables["params"], ee, k)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4)
