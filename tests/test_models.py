"""Model-layer tests: shapes, parameter-count parity with the reference
architecture (counted analytically from Generator.py/Discriminator.py), norm
semantics vs torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_gan_tpu.config import Config
from sp_gan_tpu.nn import Generator, Discriminator
from sp_gan_tpu.nn.layers import instance_norm_points, EqualDense, AdaptivePointNorm


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def cfg():
    return Config(np=64, bs=2, nk=20, nz=128)


@pytest.fixture(scope="module")
def models(cfg):
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, cfg.np, 3))
    z = jnp.zeros((2, cfg.np, cfg.nz))
    G = Generator(cfg)
    gv = G.init(key, x, z, train=True)
    D = Discriminator(cfg)
    dv = D.init(key, x, train=True)
    return G, gv, D, dv


class TestShapes:
    def test_generator_output(self, cfg, models):
        G, gv, _, _ = models
        x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.np, 3))
        z = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.np, cfg.nz)) * 0.2
        out, _ = G.apply(gv, x, z, train=True, mutable=["batch_stats"])
        assert out.shape == (2, cfg.np, 3)
        assert np.all(np.abs(np.asarray(out)) <= 1.0)  # tanh range

    def test_discriminator_output(self, cfg, models):
        _, _, D, dv = models
        x = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.np, 3))
        logits, _ = D.apply(dv, x, train=True, mutable=["batch_stats"])
        assert logits.shape == (2, 1)


class TestParamParity:
    """Parameter counts derived from the reference architecture definitions
    (Generator.py:91-156, Discriminator.py:48-95), defaults: nz=128, k=10,
    eql/attn/use_head/small_d off."""

    def test_generator_param_count(self, models):
        _, gv, _, _ = models
        # head 33408 + EdgeConv1 44032 + adain1 16512 + EdgeConv2 193600
        # + adain2 33024 + global 83840 + tail 180739
        assert n_params(gv["params"]) == 585_155

    def test_discriminator_param_count(self, models):
        _, _, _, dv = models
        # mlps 42496 + fc2 265216 + head 672641
        assert n_params(dv["params"]) == 980_353

    def test_attn_param_count(self, cfg):
        """Attention(640): theta/phi 640*80, g 640*320, o 320*640, gamma 1."""
        c = cfg.replace(attn=True)
        G = Generator(c)
        gv = G.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 3)),
                    jnp.zeros((1, 32, 128)), train=True)
        extra = 640 * 80 * 2 + 640 * 320 + 320 * 640 + 1
        assert n_params(gv["params"]) == 585_155 + extra


class TestPoolCommute:
    """D's commuted BN+lrelu+max-pool (MaxPoolBNLReLU, VERDICT r2 #6) must
    match the plain path exactly: same params (shared names), same logits,
    same batch-stat updates, same gradients."""

    def _pair(self, cfg):
        key = jax.random.PRNGKey(3)
        x = jnp.zeros((4, cfg.np, 3))
        Dc = Discriminator(cfg)                                # commuted
        Dp = Discriminator(cfg.replace(pool_commute=False))    # plain
        dv = Dc.init(key, x, train=True)
        return Dc, Dp, dv

    def test_forward_and_stats_match(self, rng):
        cfg = Config(np=64, bs=4, nk=20, nz=128, dtype="float32")
        Dc, Dp, dv = self._pair(cfg)
        # includes negative BN scales: the min-side of the commutation
        dv["params"]["bn_fc2"]["scale"] = jnp.asarray(
            rng.standard_normal(1024).astype(np.float32))
        pts = jnp.asarray(rng.standard_normal((4, 64, 3)).astype(np.float32))
        for train in (True, False):
            yc, mc = Dc.apply(dv, pts, train=train,
                              mutable=["batch_stats"])
            yp, mp = Dp.apply(dv, pts, train=train,
                              mutable=["batch_stats"])
            np.testing.assert_allclose(np.asarray(yc), np.asarray(yp),
                                       rtol=1e-5, atol=1e-5)
            for a, b in zip(jax.tree_util.tree_leaves(mc["batch_stats"]),
                            jax.tree_util.tree_leaves(mp["batch_stats"])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6)

    def test_gradients_match(self, rng):
        cfg = Config(np=64, bs=4, nk=20, nz=128, dtype="float32")
        Dc, Dp, dv = self._pair(cfg)
        dv["params"]["bn_fc2"]["scale"] = jnp.asarray(
            rng.standard_normal(1024).astype(np.float32))
        pts = jnp.asarray(rng.standard_normal((4, 64, 3)).astype(np.float32))

        def loss(params, D):
            y, _ = D.apply({"params": params,
                            "batch_stats": dv["batch_stats"]}, pts,
                           train=True, mutable=["batch_stats"])
            return jnp.sum(y ** 2)

        gc = jax.grad(lambda p: loss(p, Dc))(dv["params"])
        gp = jax.grad(lambda p: loss(p, Dp))(dv["params"])
        for a, b in zip(jax.tree_util.tree_leaves(gc),
                        jax.tree_util.tree_leaves(gp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_grad_flows_to_input(self, rng):
        cfg = Config(np=32, bs=2, nk=8, nz=16, dtype="float32")
        Dc, Dp, dv = self._pair(cfg)
        pts = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
        g = jax.grad(lambda p: float(0) + jnp.sum(Dc.apply(
            dv, p, train=False) ** 2))(pts)
        assert float(jnp.abs(g).max()) > 0


class TestNormSemantics:
    def test_instance_norm_matches_torch(self, rng):
        import torch
        x = rng.standard_normal((3, 32, 8)).astype(np.float32)  # [B,N,C]
        ours = np.asarray(instance_norm_points(jnp.array(x)))
        ref = torch.nn.InstanceNorm1d(8)(torch.tensor(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 1), atol=1e-5)

    def test_adain_identity_at_init(self, rng):
        """gamma=1, beta=0 at init -> AdaIN reduces to instance norm."""
        x = jnp.array(rng.standard_normal((2, 16, 8)).astype(np.float32))
        style = jnp.zeros((2, 16, 12))
        m = AdaptivePointNorm(8)
        v = m.init(jax.random.PRNGKey(0), x, style)
        out = m.apply(v, x, style)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(instance_norm_points(x)), atol=1e-5
        )

    def test_equal_dense_scaling(self, rng):
        """Effective weight = stored * sqrt(2/fan_in) (modules.py:262-267)."""
        x = jnp.array(rng.standard_normal((4, 16)).astype(np.float32))
        m = EqualDense(8)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        w = v["params"]["kernel"]
        expect = x @ (w * np.sqrt(2.0 / 16)) + v["params"]["bias"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


class TestDeterminism:
    def test_same_seed_same_output(self, cfg, models):
        G, gv, _, _ = models
        x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.np, 3))
        z = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.np, cfg.nz))
        a, _ = G.apply(gv, x, z, train=True, mutable=["batch_stats"])
        b, _ = G.apply(gv, x, z, train=True, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_off_flag_adds_sphere(self, cfg):
        c = cfg.replace(off=True)
        G = Generator(c)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, c.np, 3))
        z = jnp.zeros((1, c.np, c.nz))
        gv = G.init(key, x, z, train=True)
        out_off, _ = G.apply(gv, x, z, train=True, mutable=["batch_stats"])
        # tanh output is in [-1,1]; with off, output = tanh(...) + pc
        assert np.abs(np.asarray(out_off)).max() <= np.abs(np.asarray(x)).max() + 1.0


class TestGradients:
    def test_generator_grads_flow(self, cfg, models):
        G, gv, D, dv = models
        x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.np, 3))
        z = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.np, cfg.nz))

        def loss(params):
            out, _ = G.apply({"params": params, "batch_stats": gv["batch_stats"]},
                             x, z, train=True, mutable=["batch_stats"])
            return jnp.mean(out ** 2)

        g = jax.grad(loss)(gv["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        nonzero = sum(int(np.any(np.asarray(l) != 0)) for l in leaves)
        assert nonzero > len(leaves) * 0.9


class TestTemplateBatchConst:
    """`template_batch_const` (B=1 first EdgeBlock + broadcast): numerically
    equivalent to the plain graph when every x[b] is the same template."""

    def test_eval_forward_identical(self, cfg):
        from sp_gan_tpu.data import sphere_template
        c = cfg.replace(dtype="float32")
        G = Generator(c)
        sphere = jnp.asarray(sphere_template(c.np))
        x = jnp.broadcast_to(sphere[None], (3, c.np, 3))
        z = jax.random.normal(jax.random.PRNGKey(3), (3, c.np, c.nz)) * 0.2
        gv = G.init(jax.random.PRNGKey(0), x, z, train=True)
        o0 = G.apply(gv, x, z, train=False)
        o1 = G.apply(gv, x, z, train=False, template_batch_const=True)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-6)

    def test_train_forward_and_grads_match(self, cfg):
        from sp_gan_tpu.data import sphere_template
        c = cfg.replace(dtype="float32")
        G = Generator(c)
        sphere = jnp.asarray(sphere_template(c.np))
        x = jnp.broadcast_to(sphere[None], (3, c.np, 3))
        z = jax.random.normal(jax.random.PRNGKey(3), (3, c.np, c.nz)) * 0.2
        gv = G.init(jax.random.PRNGKey(0), x, z, train=True)

        outs, stats, grads = [], [], []
        for tbc in (False, True):
            def loss(params):
                out, mut = G.apply(
                    {"params": params, "batch_stats": gv["batch_stats"]},
                    x, z, train=True, template_batch_const=tbc,
                    mutable=["batch_stats"])
                return jnp.mean(out ** 2), (out, mut["batch_stats"])

            (l, (out, st)), g = jax.value_and_grad(loss, has_aux=True)(
                gv["params"])
            outs.append(np.asarray(out))
            stats.append(st)
            grads.append(g)
        # f32 BN batch stats reduce over B*N*k vs N*k (identical values,
        # different summation order); the ~1e-7 stat difference amplifies
        # through rsqrt + the conv chains to ~5e-5 at the output
        np.testing.assert_allclose(outs[0], outs[1], atol=5e-4)
        for a, b in zip(jax.tree_util.tree_leaves(stats[0]),
                        jax.tree_util.tree_leaves(stats[1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(grads[0]),
                        jax.tree_util.tree_leaves(grads[1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)

    def test_disabled_with_use_head_and_per_shard_bn(self, cfg):
        """With use_head (batch-dependent lift) or per-shard BN groups the
        flag must be a no-op (same graph, no B=1 slicing crash)."""
        from sp_gan_tpu.data import sphere_template
        for kw in ({"use_head": True},
                   {"bn_stats": "per_shard", "mesh_shape": (2,)}):
            c = cfg.replace(dtype="float32", **kw)
            G = Generator(c)
            sphere = jnp.asarray(sphere_template(c.np))
            x = jnp.broadcast_to(sphere[None], (2, c.np, 3))
            z = jax.random.normal(jax.random.PRNGKey(3), (2, c.np, c.nz))
            gv = G.init(jax.random.PRNGKey(0), x, z, train=True)
            o0, _ = G.apply(gv, x, z, train=True, mutable=["batch_stats"])
            o1, _ = G.apply(gv, x, z, train=True, template_batch_const=True,
                            mutable=["batch_stats"])
            np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
