"""Output parity against the ACTUAL upstream modules (VERDICT r4 item #1).

`tests/test_torch_parity.py` checks the converters against an independently
written torch replica; a transcription error common to the replica and the
converter would pass silently there. These tests close that hole: they import
the genuine `/root/reference/Generation/Generator.py:91-198` /
`Discriminator.py:48-114` (CUDA `metrics.pointops` import stubbed — the live
forward paths never call it, see `compat.reference_import`), load
`compat.torch_export` state_dicts with `strict=True`, and require the same
outputs for the same inputs.

The parametrization over eql / attn / use_head / off+z_norm also closes
ADVICE r4 #3: every export branch (weight_orig, attn, pc_head) is exercised
against the upstream layout, both directions.

A trained-checkpoint variant of this check at N=2048 lives in
`scripts/parity_reference_modules.py` (artifact:
`runs/parity_reference_modules.json`).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sp_gan_tpu.compat import (convert_discriminator, convert_generator,
                               export_discriminator, export_generator)
from sp_gan_tpu.compat.reference_import import (load_reference_modules,
                                                make_opts,
                                                reference_available)
from sp_gan_tpu.config import Config
from sp_gan_tpu.nn import Discriminator, Generator

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not mounted")

G_VARIANTS = [
    {},
    {"eql": True},
    {"attn": True},
    {"use_head": True},
    {"off": True, "z_norm": True},
]


@pytest.fixture(scope="module")
def upstream():
    return load_reference_modules()


def _ids(kw):
    return "+".join(sorted(kw)) or "defaults"


class TestGeneratorVsUpstream:
    @pytest.mark.parametrize("kw", G_VARIANTS, ids=_ids)
    def test_export_strict_load_and_forward(self, upstream, rng, kw):
        RefG, _ = upstream
        cfg = Config(np=32, nk=8, nz=16, dtype="float32", **kw)
        G = Generator(cfg)
        x = rng.standard_normal((2, cfg.np, 3)).astype(np.float32)
        z = (0.2 * rng.standard_normal((2, 1, cfg.nz))).astype(np.float32)
        z = np.broadcast_to(z, (2, cfg.np, cfg.nz)).copy()
        v = G.init(jax.random.PRNGKey(3), jnp.array(x), jnp.array(z),
                   train=False)
        sd = export_generator(jax.tree.map(np.asarray, v["params"]),
                              jax.tree.map(np.asarray, v["batch_stats"]), cfg)

        tg = RefG(make_opts(cfg))
        tg.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(a))
                            for k, a in sd.items()}, strict=True)
        tg.eval()
        with torch.no_grad():
            ref = tg(torch.tensor(x), torch.tensor(z)).numpy()  # [B,3,N]
        ours = G.apply(v, jnp.array(x), jnp.array(z), train=False)
        np.testing.assert_allclose(
            np.asarray(ours), ref.transpose(0, 2, 1), atol=2e-4,
            err_msg=f"upstream-module forward diverges ({kw})")

    @pytest.mark.parametrize("kw", G_VARIANTS, ids=_ids)
    def test_import_from_upstream_weights(self, upstream, rng, kw):
        """Other direction: the upstream module's own (torch-initialized)
        state_dict converted into flax reproduces the upstream forward."""
        RefG, _ = upstream
        cfg = Config(np=32, nk=8, nz=16, dtype="float32", **kw)
        torch.manual_seed(7)
        tg = RefG(make_opts(cfg)).eval()
        params, stats = convert_generator(tg.state_dict(), cfg)
        x = rng.standard_normal((2, cfg.np, 3)).astype(np.float32)
        z = (0.2 * rng.standard_normal((2, 1, cfg.nz))).astype(np.float32)
        z = np.broadcast_to(z, (2, cfg.np, cfg.nz)).copy()
        with torch.no_grad():
            ref = tg(torch.tensor(x), torch.tensor(z)).numpy()
        ours = Generator(cfg).apply(
            {"params": params, "batch_stats": stats},
            jnp.array(x), jnp.array(z), train=False)
        np.testing.assert_allclose(np.asarray(ours), ref.transpose(0, 2, 1),
                                   atol=2e-4)


class TestDiscriminatorVsUpstream:
    @pytest.mark.parametrize("small_d", [False, True],
                             ids=["full", "small_d"])
    def test_both_directions(self, upstream, rng, small_d):
        _, RefD = upstream
        cfg = Config(np=32, nk=8, nz=16, dtype="float32", small_d=small_d)
        D = Discriminator(cfg)
        x = rng.standard_normal((2, cfg.np, 3)).astype(np.float32)
        v = D.init(jax.random.PRNGKey(4), jnp.array(x), train=False)
        sd = export_discriminator(
            jax.tree.map(np.asarray, v["params"]),
            jax.tree.map(np.asarray, v["batch_stats"]), cfg)
        td = RefD(make_opts(cfg), num_point=cfg.np)
        td.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(a))
                            for k, a in sd.items()}, strict=True)
        td.eval()
        with torch.no_grad():
            ref = td(torch.tensor(x).transpose(2, 1)).numpy()
        ours = D.apply(v, jnp.array(x), train=False)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)
        # import direction from the upstream torch init
        params, stats = convert_discriminator(td.state_dict(), cfg)
        ours2 = D.apply({"params": params, "batch_stats": stats},
                        jnp.array(x), train=False)
        np.testing.assert_allclose(np.asarray(ours2), ref, atol=2e-4)
