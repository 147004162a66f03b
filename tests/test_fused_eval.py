"""Fused eval path == Generator.apply(train=False) (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sp_gan_tpu.config import Config
from sp_gan_tpu.nn import Generator
from sp_gan_tpu.nn.fused_eval import generator_forward_eval, supports_fused


@pytest.fixture(scope="module")
def setup():
    cfg = Config(np=64, nk=8, nz=16, dtype="float32")
    G = Generator(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, cfg.np, 3))
    z = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (2, cfg.np, cfg.nz))
    gv = G.init(key, x, z, train=True)
    # run one train-mode step so batch stats are non-trivial
    _, mut = G.apply(gv, x, z, train=True, mutable=["batch_stats"])
    gv = {"params": gv["params"], "batch_stats": mut["batch_stats"]}
    return cfg, G, gv, x, z


class TestFusedEval:
    def test_supports(self):
        assert supports_fused(Config())
        assert not supports_fused(Config(attn=True))

    def test_matches_reference_forward(self, setup):
        cfg, G, gv, x, z = setup
        ref = G.apply(gv, x, z, train=False)
        with pltpu.force_tpu_interpret_mode():
            fused = generator_forward_eval(cfg, gv, x, z)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=5e-4,
                                   err_msg="fused eval diverges from G.apply")

    def test_off_flag(self, setup):
        cfg, G, gv, x, z = setup
        cfg_off = cfg.replace(off=True)
        G2 = Generator(cfg_off)
        ref = G2.apply(gv, x, z, train=False)
        with pltpu.force_tpu_interpret_mode():
            fused = generator_forward_eval(cfg_off, gv, x, z)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=5e-4)
