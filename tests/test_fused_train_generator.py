"""Fused train-mode generator == flax Generator (train=True): outputs,
updated batch stats, and parameter gradients (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sp_gan_tpu.config import Config
from sp_gan_tpu.nn import Generator
from sp_gan_tpu.nn.fused_train import generator_forward_train


@pytest.fixture(scope="module")
def setup():
    cfg = Config(np=64, nk=8, nz=16, dtype="float32")
    G = Generator(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, cfg.np, 3))
    z = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (2, cfg.np, cfg.nz))
    gv = G.init(key, x, z, train=True)
    return cfg, G, gv, x, z


class TestFusedTrainGenerator:
    def test_output_and_stats_match(self, setup):
        cfg, G, gv, x, z = setup
        ref, mut = G.apply(gv, x, z, train=True, mutable=["batch_stats"])
        with pltpu.force_tpu_interpret_mode():
            out, stats = generator_forward_train(cfg, gv["params"],
                                                 gv["batch_stats"], x, z)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3)
        ref_leaves = dict(jax.tree_util.tree_leaves_with_path(
            mut["batch_stats"]))
        for path, leaf in jax.tree_util.tree_leaves_with_path(stats):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(ref_leaves[path]), atol=1e-3,
                err_msg=jax.tree_util.keystr(path))

    def test_grads_match(self, setup):
        cfg, G, gv, x, z = setup
        cot = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.np, 3))

        def loss_flax(p):
            out, _ = G.apply({"params": p, "batch_stats": gv["batch_stats"]},
                             x, z, train=True, mutable=["batch_stats"])
            return jnp.sum(out * cot)

        def loss_fused(p):
            out, _ = generator_forward_train(cfg, p, gv["batch_stats"], x, z)
            return jnp.sum(out * cot)

        g_ref = jax.grad(loss_flax)(gv["params"])
        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused)(gv["params"])

        ref_leaves = dict(jax.tree_util.tree_leaves_with_path(g_ref))
        for path, leaf in jax.tree_util.tree_leaves_with_path(g_fused):
            name = jax.tree_util.keystr(path)
            ref_leaf = np.asarray(ref_leaves[path]).ravel()
            ours = np.asarray(leaf).ravel()
            pre_bn_bias = ("conv" in name and "bias" in name
                           and "edge" in name) or \
                name in ("['global1']['bias']", "['global2']['bias']")
            if pre_bn_bias:
                # a dense bias feeding a train-mode BN has analytically zero
                # gradient; autodiff values on either side are cancellation
                # noise
                assert np.abs(ref_leaf).max() < 5e-3, name
                assert np.abs(ours).max() < 5e-3, name
                continue
            # Everything outside the edge blocks is plain autodiff in both
            # implementations; residual differences come from fp rounding and
            # argmax tie-routing through the global max-pool. Cosine
            # similarity is the robust check; the custom kernels' gradients
            # are compared exactly against an autodiff oracle in
            # test_edgeblock_train_fused.py.
            denom = np.linalg.norm(ref_leaf) * np.linalg.norm(ours)
            if denom < 1e-8:
                continue
            cos = float(ref_leaf @ ours / denom)
            assert cos > 0.995, f"{name}: cosine {cos:.4f}"
            rel = np.linalg.norm(ours - ref_leaf) / (
                np.linalg.norm(ref_leaf) + 1e-8)
            # 0.15: accumulation-order noise through the cancellation-prone
            # AdaIN/instance-norm chain moves with the kernels' chunked-sum
            # order; the direction check above is the meaningful one
            assert rel < 0.15, f"{name}: rel L2 {rel:.4f}"
