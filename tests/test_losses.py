"""GAN loss tests vs hand-computed values (loss_utils.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sp_gan_tpu.losses import dis_loss, gen_loss, r1_penalty, wgan_gp


class TestLS:
    def test_dis_loss_values(self):
        d_real = jnp.array([1.0, 1.0])
        d_fake = jnp.array([0.0, 0.0])
        loss, info = dis_loss(d_real, d_fake, gan="ls")
        assert float(loss) == pytest.approx(0.0)
        assert float(info["real_acc"]) == 1.0
        assert float(info["fake_acc"]) == 1.0

    def test_dis_loss_worst_case(self):
        loss, info = dis_loss(jnp.zeros(4), jnp.ones(4), gan="ls")
        assert float(loss) == pytest.approx(2.0)  # mse(0,1)+mse(1,0)
        assert float(info["real_acc"]) == 0.0

    def test_gen_loss_value(self):
        loss, _ = gen_loss(None, jnp.zeros(4), gan="ls")
        assert float(loss) == pytest.approx(1.0)


class TestWGAN:
    def test_dis(self):
        loss, _ = dis_loss(jnp.array([2.0]), jnp.array([1.0]), gan="wgan")
        assert float(loss) == pytest.approx(-1.0)

    def test_gen(self):
        loss, _ = gen_loss(None, jnp.array([3.0]), gan="wgan")
        assert float(loss) == pytest.approx(-3.0)


class TestHinge:
    def test_dis(self):
        loss, _ = dis_loss(jnp.array([0.5]), jnp.array([-0.5]), gan="hinge")
        assert float(loss) == pytest.approx(0.5 + 0.5)

    def test_saturation(self):
        loss, _ = dis_loss(jnp.array([2.0]), jnp.array([-2.0]), gan="hinge")
        assert float(loss) == pytest.approx(0.0)


class TestBCE:
    def test_matches_formula(self):
        import math
        loss, _ = dis_loss(jnp.array([0.0]), jnp.array([0.0]), gan="gan")
        assert float(loss) == pytest.approx(2 * math.log(2), rel=1e-5)


class TestRelativistic:
    def test_symmetric_zero_logits(self):
        loss, _ = dis_loss(jnp.zeros(4), jnp.zeros(4), gan="real")
        assert float(loss) == pytest.approx(1.0)


class TestNoiseLabels:
    def test_noise_label_changes_loss(self):
        key = jax.random.PRNGKey(0)
        l1, _ = dis_loss(jnp.ones(64), jnp.zeros(64), gan="ls",
                         noise_label=True, rng=key)
        l0, _ = dis_loss(jnp.ones(64), jnp.zeros(64), gan="ls")
        assert float(l1) > float(l0)  # smoothing/flip moves labels off {0,1}


class TestPenalties:
    def _quad_d(self, x):
        return jnp.sum(x ** 2, axis=(1, 2))

    def test_r1_value(self):
        # D(x)=sum x^2 -> grad=2x -> ||grad||^2 = 4 sum x^2
        x = jnp.ones((2, 4, 3))
        gp = r1_penalty(self._quad_d, x)
        assert float(gp) == pytest.approx(4 * 12)

    def test_wgan_gp_zero_for_unit_gradient(self):
        # D(x) = sum of first coordinate -> grad norm = sqrt(N)
        def d(x):
            return jnp.sum(x[..., 0], axis=-1)

        real = jnp.zeros((2, 4, 3))
        fake = jnp.ones((2, 4, 3))
        gp = wgan_gp(d, real, fake, jax.random.PRNGKey(0), lambda_gp=10.0,
                     gamma=2.0)  # grad norm = sqrt(4) = 2 == gamma -> 0
        assert float(gp) == pytest.approx(0.0, abs=1e-6)

    def test_wgan_gp_nonzero(self):
        gp = wgan_gp(self._quad_d, jnp.zeros((2, 4, 3)),
                     jnp.ones((2, 4, 3)), jax.random.PRNGKey(1))
        assert float(gp) > 0


class TestShapePreserving:
    def test_identical_clouds_near_zero(self):
        import numpy as np
        from sp_gan_tpu.losses import shape_preserving_loss
        rng = np.random.default_rng(0)
        x = jnp.array(rng.standard_normal((2, 32, 3)).astype(np.float32))
        mu, var = shape_preserving_loss(x, x, k=4)
        assert float(mu) == pytest.approx(0.0, abs=1e-5)
        assert float(var) == pytest.approx(0.0, abs=1e-5)

    def test_differs_for_different_clouds(self):
        import numpy as np
        from sp_gan_tpu.losses import shape_preserving_loss
        rng = np.random.default_rng(0)
        x = jnp.array(rng.standard_normal((1, 32, 3)).astype(np.float32))
        y = jnp.array(rng.standard_normal((1, 32, 3)).astype(np.float32))
        mu, var = shape_preserving_loss(x, y, k=4)
        assert float(mu) > 0

    def test_differentiable(self):
        import numpy as np
        from sp_gan_tpu.losses import shape_preserving_loss
        rng = np.random.default_rng(0)
        x = jnp.array(rng.standard_normal((1, 16, 3)).astype(np.float32))
        y = jnp.array(rng.standard_normal((1, 16, 3)).astype(np.float32))
        g = jax.grad(lambda a: sum(shape_preserving_loss(a, y, k=4)))(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestPointAux:
    def test_repulsion_zero_when_spread(self):
        import numpy as np
        from sp_gan_tpu.losses import repulsion_loss
        pts = np.zeros((1, 8, 3), np.float32)
        pts[0, :, 0] = np.arange(8)          # spacing 1 >> h
        assert float(repulsion_loss(jnp.array(pts), k=2, h=0.03)) == 0.0

    def test_repulsion_penalizes_clumps(self):
        import numpy as np
        from sp_gan_tpu.losses import repulsion_loss
        pts = np.zeros((1, 8, 3), np.float32)  # all coincident
        assert float(repulsion_loss(jnp.array(pts), k=2, h=0.03)) > 0

    def test_uniform_prefers_uniform(self):
        import numpy as np
        from sp_gan_tpu.losses import uniform_loss
        rng = np.random.default_rng(0)
        uni = rng.uniform(-1, 1, (1, 256, 3)).astype(np.float32)
        clump = np.concatenate([uni[:, :128] * 0.05, uni[:, 128:]], 1)
        assert float(uniform_loss(jnp.array(uni))) < \
            float(uniform_loss(jnp.array(clump)))
