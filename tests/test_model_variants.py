"""Flag-gated model variants: eql (equalized LR), use_head, z_norm, small_d,
off — forward smoke + converter coverage for the eql layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from sp_gan_tpu.config import Config
from sp_gan_tpu.compat.torch_import import _dense
from sp_gan_tpu.nn import Discriminator, Generator


def fwd(cfg, B=2):
    G = Generator(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, cfg.np, 3))
    z = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (B, cfg.np, cfg.nz))
    gv = G.init(key, x, z, train=True)
    out, _ = G.apply(gv, x, z, train=True, mutable=["batch_stats"])
    return np.asarray(out), gv


class TestVariants:
    @pytest.mark.parametrize("flags", [
        dict(eql=True),
        dict(use_head=True),
        dict(z_norm=True),
        dict(off=True),
        dict(attn=True),
        dict(eql=True, use_head=True, attn=True, z_norm=True, off=True),
    ])
    def test_generator_forward(self, flags):
        cfg = Config(np=32, nk=8, nz=16, **flags)
        out, _ = fwd(cfg)
        assert out.shape == (2, 32, 3)
        assert np.all(np.isfinite(out))

    def test_small_d(self):
        cfg = Config(np=32, nk=8, nz=16, small_d=True)
        D = Discriminator(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 3))
        dv = D.init(jax.random.PRNGKey(1), x, train=True)
        # fc2 width halved
        assert dv["params"]["fc2"]["kernel"].shape == (256, 512)

    def test_use_head_param_shapes(self):
        cfg = Config(np=32, nk=8, nz=16, use_head=True)
        _, gv = fwd(cfg)
        p = gv["params"]
        assert p["pc_head1"]["kernel"].shape == (3, 64)
        assert p["pc_head2"]["kernel"].shape == (64, 128)
        # EdgeConv1 consumes the lifted 128-d features
        assert p["edge1"]["conv_x"]["kernel"].shape == (256, 128)


class TestEqlConverter:
    def test_equal_lr_key_mapping(self):
        """The converter must read `*.conv.weight_orig` for EqualLR-wrapped
        convs (reference modules.py:279-283 renames the parameter)."""
        conv = tnn.Conv1d(8, 4, 1)
        sd = {"head.0.conv.weight_orig": conv.weight.detach(),
              "head.0.conv.bias": conv.bias.detach()}
        out = _dense(sd, "head.0", eql=True)
        assert out["kernel"].shape == (8, 4)
        np.testing.assert_allclose(
            out["kernel"], conv.weight.detach().numpy().reshape(4, 8).T)

    def test_eql_forward_uses_scaling(self):
        """EqualDense output == stored_kernel * sqrt(2/fan_in) semantics end
        to end inside the generator head."""
        cfg = Config(np=32, nk=8, nz=16, eql=True)
        out, gv = fwd(cfg)
        # stored kernels are N(0,1)-scale, so raw std ~1
        k = np.asarray(gv["params"]["head1"]["kernel"])
        assert 0.5 < k.std() < 2.0
