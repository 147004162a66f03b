"""Tests for the PointNet++/PointConv/PointTransformer layer stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_gan_tpu.nn.pointnet import (
    FeaturePropagation,
    PointConv,
    PointTransformerLayer,
    SetAbstraction,
    SetAbstractionMSG,
)


@pytest.fixture
def xyz(rng):
    return jnp.array(rng.standard_normal((2, 64, 3)).astype(np.float32))


@pytest.fixture
def feats(rng):
    return jnp.array(rng.standard_normal((2, 64, 8)).astype(np.float32))


class TestSetAbstraction:
    def test_shapes(self, xyz, feats):
        sa = SetAbstraction(npoint=16, radius=0.5, nsample=8, mlp=(16, 32))
        v = sa.init(jax.random.PRNGKey(0), xyz, feats, train=True)
        (nx, nf), _ = sa.apply(v, xyz, feats, train=True,
                               mutable=["batch_stats"])
        assert nx.shape == (2, 16, 3)
        assert nf.shape == (2, 16, 32)

    def test_group_all(self, xyz, feats):
        sa = SetAbstraction(npoint=1, radius=0, nsample=0, mlp=(16,),
                            group_all=True)
        v = sa.init(jax.random.PRNGKey(0), xyz, feats, train=True)
        (nx, nf), _ = sa.apply(v, xyz, feats, train=True,
                               mutable=["batch_stats"])
        assert nf.shape == (2, 1, 16)

    def test_no_features(self, xyz):
        sa = SetAbstraction(npoint=8, radius=0.4, nsample=4, mlp=(8,))
        v = sa.init(jax.random.PRNGKey(0), xyz, None, train=True)
        (nx, nf), _ = sa.apply(v, xyz, None, train=True,
                               mutable=["batch_stats"])
        assert nf.shape == (2, 8, 8)


class TestMSG:
    def test_multi_scale_concat(self, xyz, feats):
        sa = SetAbstractionMSG(npoint=16, radii=(0.2, 0.5),
                               nsamples=(4, 8), mlps=((8, 16), (8, 32)))
        v = sa.init(jax.random.PRNGKey(0), xyz, feats, train=True)
        (nx, nf), _ = sa.apply(v, xyz, feats, train=True,
                               mutable=["batch_stats"])
        assert nf.shape == (2, 16, 16 + 32)


class TestFP:
    def test_interpolation_shapes(self, xyz, rng):
        xyz2 = jnp.array(rng.standard_normal((2, 16, 3)).astype(np.float32))
        feat2 = jnp.array(rng.standard_normal((2, 16, 32)).astype(np.float32))
        fp = FeaturePropagation(mlp=(16,))
        v = fp.init(jax.random.PRNGKey(0), xyz, xyz2, None, feat2, train=True)
        out, _ = fp.apply(v, xyz, xyz2, None, feat2, train=True,
                          mutable=["batch_stats"])
        assert out.shape == (2, 64, 16)

    def test_single_source_broadcast(self, xyz, rng):
        xyz2 = jnp.zeros((2, 1, 3))
        feat2 = jnp.array(rng.standard_normal((2, 1, 32)).astype(np.float32))
        fp = FeaturePropagation(mlp=(8,))
        v = fp.init(jax.random.PRNGKey(0), xyz, xyz2, None, feat2, train=True)
        out, _ = fp.apply(v, xyz, xyz2, None, feat2, train=True,
                          mutable=["batch_stats"])
        assert out.shape == (2, 64, 8)


class TestPointConv:
    def test_shapes(self, xyz, feats):
        pc = PointConv(npoint=16, nsample=8, mlp=(16, 32))
        v = pc.init(jax.random.PRNGKey(0), xyz, feats, train=True)
        (nx, nf), _ = pc.apply(v, xyz, feats, train=True,
                               mutable=["batch_stats"])
        assert nx.shape == (2, 16, 3)
        assert nf.shape == (2, 16, 32)


class TestPointTransformer:
    def test_shape_preserving(self, xyz, rng):
        x = jnp.array(rng.standard_normal((2, 64, 32)).astype(np.float32))
        pt = PointTransformerLayer(dim=32, k=8)
        v = pt.init(jax.random.PRNGKey(0), x, xyz)
        out = pt.apply(v, x, xyz)
        assert out.shape == (2, 64, 32)

    def test_grads_flow(self, xyz, rng):
        x = jnp.array(rng.standard_normal((1, 32, 16)).astype(np.float32))
        pt = PointTransformerLayer(dim=16, k=4)
        v = pt.init(jax.random.PRNGKey(0), x, xyz[:1, :32])
        g = jax.grad(lambda p: (pt.apply(p, x, xyz[:1, :32]) ** 2).sum())(v)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
