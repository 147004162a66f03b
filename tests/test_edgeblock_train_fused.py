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


def xla_block_from_ee(params, ee, k, neg=0.01, eps=1e-5):
    """Pure-jnp train-mode EdgeBlock taking the edge tensor directly — the
    autodiff oracle for the fused backward."""
    B, N, kk, C2 = ee.shape
    C = C2 // 2

    def bn(h, p):
        mean = h.mean(axis=(0, 1, 2))
        var = ((h - mean) ** 2).mean(axis=(0, 1, 2))
        return (h - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]

    lrelu = lambda v: jnp.where(v >= 0, v, neg * v)
    diff = ee[..., C:]
    h1 = diff @ params["conv_w1"]["kernel"] + params["conv_w1"]["bias"]
    y1 = lrelu(bn(h1, params["bn_w1"]))
    h2 = y1 @ params["conv_w2"]["kernel"] + params["conv_w2"]["bias"]
    w = jax.nn.softmax(lrelu(bn(h2, params["bn_w2"])), axis=2)
    hx = ee @ params["conv_x"]["kernel"] + params["conv_x"]["bias"]
    v = lrelu(bn(hx, params["bn_x"]))
    u = v * w
    out = jnp.einsum("bnkc,kco->bno", u, params["out_kernel"])
    return out + params["out_bias"]


class TestFusedTrainBackward:
    def test_grads_match_autodiff(self, setup):
        from sp_gan_tpu.ops.pallas.edgeblock_train import (
            edge_block_train_backward, edge_block_train_stats)
        blk, variables, x, idx, ee, k, F = setup
        params = variables["params"]
        cot = jax.random.normal(jax.random.PRNGKey(5),
                                (ee.shape[0], ee.shape[1], F))

        # oracle forward must agree first
        ref_out = xla_block_from_ee(params, ee, k)
        flax_out, _ = flax_forward(blk, variables, x, idx)
        np.testing.assert_allclose(np.asarray(ref_out), np.asarray(flax_out),
                                   atol=5e-4)

        d_params_o, d_ee_o = jax.grad(
            lambda p, e: jnp.sum(xla_block_from_ee(p, e, k) * cot),
            argnums=(0, 1))(params, ee)

        with pltpu.force_tpu_interpret_mode():
            stats = edge_block_train_stats(params, ee, k)
            d_params, d_ee = edge_block_train_backward(params, ee, stats,
                                                       cot, k)

        np.testing.assert_allclose(np.asarray(d_ee), np.asarray(d_ee_o),
                                   atol=2e-3, err_msg="d_ee")
        flat_o = jax.tree_util.tree_leaves_with_path(d_params_o)
        flat_f = dict(jax.tree_util.tree_leaves_with_path(d_params))
        for path, leaf_o in flat_o:
            leaf_f = flat_f[path]
            name = jax.tree_util.keystr(path)
            if "bias" in name and "bn" not in name and "out" not in name:
                # conv biases feeding a train-mode BN have exactly zero grad
                np.testing.assert_allclose(np.asarray(leaf_o), 0.0, atol=1e-4,
                                           err_msg=f"{name} oracle nonzero?")
                continue
            scale = max(1e-3, float(np.abs(np.asarray(leaf_o)).max()))
            np.testing.assert_allclose(
                np.asarray(leaf_f), np.asarray(leaf_o),
                atol=2e-3 * scale, err_msg=name)
