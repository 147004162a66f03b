"""Numerical parity against an independently-written PyTorch replica of the
reference architecture (`/root/reference/Generation/Generator.py` /
`Discriminator.py`), driven through the `.pth` converter
(`sp_gan_tpu.compat.torch_import`).

This is the output-fidelity check from BASELINE.json's north star: weights
trained in the reference layout must produce the same outputs in this
framework. The torch modules below are built fresh from the architecture
description (channel-first torch idiom) and their `state_dict()` keys match
the reference's, so the converter sees real reference-shaped checkpoints.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from sp_gan_tpu.config import Config
from sp_gan_tpu.compat import (convert_discriminator, convert_generator,
                               export_discriminator, export_generator)
from sp_gan_tpu.nn import Discriminator, Generator

torch.manual_seed(0)


# ----------------------------------------------------------------- torch ref
def torch_edge_features(x: torch.Tensor, k: int) -> torch.Tensor:
    """[B,C,N] -> [B,2C,N,k]: sorted-ascending kNN excluding self, edge feats
    [central, nbr-central] — the reference get_edge_features contract.

    Honors SPGAN_KNN_STABLE (the sort-stable tie-break parity mode of
    `ops.pairwise.knn_indices`): identical bucketed ordering on both sides
    makes near-tie neighbor order implementation-independent, so parity can
    run at full N."""
    from sp_gan_tpu.ops.pairwise import stable_knn_grid

    B, C, N = x.shape
    xt = x.transpose(1, 2)                                  # [B,N,C]
    d = (xt.pow(2).sum(-1, keepdim=True)
         - 2 * xt @ x + x.pow(2).sum(1, keepdim=True))      # [B,N,N]
    grid = stable_knn_grid()
    if grid:
        d = d.masked_fill(torch.eye(N, dtype=torch.bool), float("inf"))
        mean_d = d[torch.isfinite(d)].mean()
        scale = 2.0 ** torch.round(torch.log2(mean_d))
        bucket = torch.floor(d / (grid * scale))
        idx = bucket.argsort(dim=2, stable=True)[:, :, :k]
    else:
        idx = d.argsort(dim=2)[:, :, 1:k + 1]               # [B,N,k]
    nbrs = torch.gather(
        xt.unsqueeze(2).expand(B, N, k, C), 1,
        idx.unsqueeze(-1).expand(B, N, k, C))
    central = xt.unsqueeze(2).expand(B, N, k, C)
    ee = torch.cat([central, nbrs - central], dim=-1)       # [B,N,k,2C]
    return ee.permute(0, 3, 1, 2)                           # [B,2C,N,k]


class TEdgeBlock(tnn.Module):
    def __init__(self, fin, fout, k):
        super().__init__()
        self.k, self.fin = k, fin
        self.conv_w = tnn.Sequential(
            tnn.Conv2d(fin, fout // 2, 1), tnn.BatchNorm2d(fout // 2),
            tnn.LeakyReLU(0.01, inplace=True),
            tnn.Conv2d(fout // 2, fout, 1), tnn.BatchNorm2d(fout),
            tnn.LeakyReLU(0.01, inplace=True))
        self.conv_x = tnn.Sequential(
            tnn.Conv2d(2 * fin, fout, (1, 1)), tnn.BatchNorm2d(fout),
            tnn.LeakyReLU(0.01, inplace=True))
        self.conv_out = tnn.Conv2d(fout, fout, (1, k))

    def forward(self, x):
        ee = torch_edge_features(x, self.k)
        w = tF.softmax(self.conv_w(ee[:, self.fin:]), dim=-1)
        v = self.conv_x(ee) * w
        return self.conv_out(v).squeeze(3)


class TAdain(tnn.Module):
    def __init__(self, channels, style_dim):
        super().__init__()
        self.norm = tnn.InstanceNorm1d(channels)
        self.style = tnn.Conv1d(style_dim, channels * 2, 1)

    def forward(self, x, style):
        gb = self.style(style)
        gamma, beta = gb.chunk(2, 1)
        return gamma * self.norm(x) + beta


class TGenerator(tnn.Module):
    """Reference-shaped generator, default flags (no eql/attn/use_head/off)."""

    def __init__(self, nz, k):
        super().__init__()
        dim = 128
        self.head = tnn.Sequential(
            tnn.Conv1d(3 + nz, dim, 1), tnn.LeakyReLU(0.01, inplace=True),
            tnn.Conv1d(dim, dim, 1), tnn.LeakyReLU(0.01, inplace=True))
        self.EdgeConv1 = TEdgeBlock(3, 64, k)
        self.adain1 = TAdain(64, dim)
        self.EdgeConv2 = TEdgeBlock(64, dim, k)
        self.adain2 = TAdain(dim, dim)
        self.global_conv = tnn.Sequential(
            tnn.Linear(dim, dim), tnn.BatchNorm1d(dim),
            tnn.LeakyReLU(0.01, inplace=True),
            tnn.Linear(dim, 512), tnn.BatchNorm1d(512),
            tnn.LeakyReLU(0.01, inplace=True))
        self.tail = tnn.Sequential(
            tnn.Conv1d(512 + dim, 256, 1), tnn.LeakyReLU(0.01, inplace=True),
            tnn.Conv1d(256, 64, 1), tnn.LeakyReLU(0.01, inplace=True),
            tnn.Conv1d(64, 3, 1), tnn.Tanh())

    def forward(self, x, z):
        B, N, _ = x.shape
        style = self.head(torch.cat([x, z], -1).transpose(2, 1))
        pc = x.transpose(2, 1)
        x1 = self.adain1(tF.leaky_relu(self.EdgeConv1(pc), 0.2), style)
        x2 = self.adain2(tF.leaky_relu(self.EdgeConv2(x1), 0.2), style)
        g = x2.max(2).values
        g = self.global_conv(g).unsqueeze(2).expand(B, 512, N)
        return self.tail(torch.cat([g, x2], 1))


class TDiscriminator(tnn.Module):
    def __init__(self):
        super().__init__()
        self.mlps = tnn.Sequential(
            tnn.Conv1d(3, 64, 1), tnn.BatchNorm1d(64),
            tnn.LeakyReLU(0.01, inplace=True),
            tnn.Conv1d(64, 128, 1), tnn.BatchNorm1d(128),
            tnn.LeakyReLU(0.01, inplace=True),
            tnn.Conv1d(128, 256, 1), tnn.BatchNorm1d(256),
            tnn.LeakyReLU(0.01, inplace=True))
        self.fc2 = tnn.Sequential(
            tnn.Conv1d(256, 1024, 1), tnn.BatchNorm1d(1024),
            tnn.LeakyReLU(0.01, inplace=True))
        self.mlp = tnn.Sequential(
            tnn.Linear(1024, 512), tnn.LeakyReLU(0.01, inplace=True),
            tnn.Linear(512, 256), tnn.LeakyReLU(0.01, inplace=True),
            tnn.Linear(256, 64), tnn.LeakyReLU(0.01, inplace=True),
            tnn.Linear(64, 1))

    def forward(self, x):
        h = self.fc2(self.mlps(x))
        return self.mlp(tF.adaptive_max_pool1d(h, 1).squeeze(2))


# ----------------------------------------------------------------- tests
@pytest.fixture(scope="module")
def cfg():
    return Config(np=32, nk=8, nz=16, dtype="float32")  # bit-level parity needs f32 edges   # k = 4


class TestGeneratorParity:
    def test_forward_matches(self, cfg, rng):
        tg = TGenerator(cfg.nz, cfg.k).eval()
        params, stats = convert_generator(tg.state_dict(), cfg)

        x = rng.standard_normal((2, cfg.np, 3)).astype(np.float32)
        z = (0.2 * rng.standard_normal((2, 1, cfg.nz))).astype(np.float32)
        z = np.broadcast_to(z, (2, cfg.np, cfg.nz)).copy()

        with torch.no_grad():
            ref = tg(torch.tensor(x), torch.tensor(z)).numpy()  # [B,3,N]

        G = Generator(cfg)
        ours = G.apply({"params": params, "batch_stats": stats},
                       jnp.array(x), jnp.array(z), train=False)
        np.testing.assert_allclose(
            np.asarray(ours), ref.transpose(0, 2, 1), atol=2e-4,
            err_msg="generator forward diverges from reference-shaped torch")

    def test_train_mode_matches(self, cfg, rng):
        """Batch-stat (train-mode) semantics also match — this exercises
        BatchNorm batch statistics, the path used during training."""
        tg = TGenerator(cfg.nz, cfg.k).train()
        params, stats = convert_generator(tg.state_dict(), cfg)
        x = rng.standard_normal((2, cfg.np, 3)).astype(np.float32)
        z = np.zeros((2, cfg.np, cfg.nz), np.float32)
        with torch.no_grad():
            ref = tg(torch.tensor(x), torch.tensor(z)).numpy()
        G = Generator(cfg)
        ours, _ = G.apply({"params": params, "batch_stats": stats},
                          jnp.array(x), jnp.array(z), train=True,
                          mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(ours), ref.transpose(0, 2, 1),
                                   atol=2e-4)


class TestFullNParity:
    def test_generator_forward_matches_at_full_n(self, rng, monkeypatch):
        """Parity at the production N=2048 (VERDICT r2 weak-6): with the
        sort-stable tie-break active on both sides, feature-space kNN
        near-ties order identically and the forward agrees to 1e-3 (without
        it, order flips among equal-distance neighbors drove the max diff to
        5.3e-2 — BASELINE.md dress rehearsal)."""
        monkeypatch.setenv("SPGAN_KNN_STABLE", "1")
        cfg2k = Config(np=2048, nk=20, nz=128, dtype="float32",
                       use_pallas=False)
        tg = TGenerator(cfg2k.nz, cfg2k.k).eval()
        params, stats = convert_generator(tg.state_dict(), cfg2k)
        x = rng.standard_normal((1, cfg2k.np, 3)).astype(np.float32)
        z = (0.2 * rng.standard_normal((1, 1, cfg2k.nz))).astype(np.float32)
        z = np.broadcast_to(z, (1, cfg2k.np, cfg2k.nz)).copy()
        with torch.no_grad():
            ref = tg(torch.tensor(x), torch.tensor(z)).numpy()
        G = Generator(cfg2k)
        ours = G.apply({"params": params, "batch_stats": stats},
                       jnp.array(x), jnp.array(z), train=False)
        np.testing.assert_allclose(np.asarray(ours), ref.transpose(0, 2, 1),
                                   atol=1e-3)


class TestDiscriminatorParity:
    def test_forward_matches(self, cfg, rng):
        td = TDiscriminator().eval()
        params, stats = convert_discriminator(td.state_dict(), cfg)
        x = rng.standard_normal((2, cfg.np, 3)).astype(np.float32)
        with torch.no_grad():
            ref = td(torch.tensor(x).transpose(2, 1)).numpy()
        D = Discriminator(cfg)
        ours = D.apply({"params": params, "batch_stats": stats},
                       jnp.array(x), train=False)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


class TestExport:
    """flax -> reference .pth direction (compat.torch_export): checkpoints
    trained HERE must load into reference-layout torch modules strict=True
    and produce the same outputs."""

    def _init_generator(self, cfg, rng):
        G = Generator(cfg)
        x = jnp.array(rng.standard_normal((2, cfg.np, 3)), jnp.float32)
        z = jnp.zeros((2, cfg.np, cfg.nz), jnp.float32)
        v = G.init(jax.random.PRNGKey(3), x, z, train=False)
        return G, v["params"], v["batch_stats"]

    def test_generator_roundtrip_identity(self, cfg, rng):
        # export -> import must reproduce the exact flax trees
        _, params, stats = self._init_generator(cfg, rng)
        sd = export_generator(jax.tree.map(np.asarray, params),
                              jax.tree.map(np.asarray, stats), cfg)
        params2, stats2 = convert_generator(sd, cfg)
        for a, b in zip(jax.tree.leaves((params, stats)),
                        jax.tree.leaves((params2, stats2))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("flag", ["eql", "attn", "use_head"])
    def test_generator_roundtrip_identity_variants(self, flag, rng):
        # exercise the eql weight_orig, attn, and pc_head export branches
        # (ADVICE r4: default-cfg-only tests let a wrong transpose there
        # silently corrupt exported .pth for those configs); the import
        # side already supports all three, so roundtrip needs no torch
        # modules — tree-exact equality is the contract.
        vcfg = Config(np=32, nk=8, nz=16, dtype="float32", **{flag: True})
        _, params, stats = self._init_generator(vcfg, rng)
        sd = export_generator(jax.tree.map(np.asarray, params),
                              jax.tree.map(np.asarray, stats), vcfg)
        params2, stats2 = convert_generator(sd, vcfg)
        la, lb = (jax.tree.leaves((params, stats)),
                  jax.tree.leaves((params2, stats2)))
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_generator_export_loads_into_torch_strict(self, cfg, rng):
        G, params, stats = self._init_generator(cfg, rng)
        sd = export_generator(jax.tree.map(np.asarray, params),
                              jax.tree.map(np.asarray, stats), cfg)
        tg = TGenerator(cfg.nz, cfg.k)
        tg.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()}, strict=True)
        tg.eval()
        x = rng.standard_normal((2, cfg.np, 3)).astype(np.float32)
        z = (0.2 * rng.standard_normal((2, 1, cfg.nz))).astype(np.float32)
        z = np.broadcast_to(z, (2, cfg.np, cfg.nz)).copy()
        ours = G.apply({"params": params, "batch_stats": stats},
                       jnp.array(x), jnp.array(z), train=False)
        with torch.no_grad():
            ref = tg(torch.tensor(x), torch.tensor(z)).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref.transpose(0, 2, 1),
                                   atol=2e-4)

    def test_discriminator_roundtrip_and_torch_load(self, cfg, rng):
        D = Discriminator(cfg)
        x = jnp.array(rng.standard_normal((2, cfg.np, 3)), jnp.float32)
        v = D.init(jax.random.PRNGKey(4), x, train=False)
        params = jax.tree.map(np.asarray, v["params"])
        stats = jax.tree.map(np.asarray, v["batch_stats"])
        sd = export_discriminator(params, stats, cfg)
        params2, stats2 = convert_discriminator(sd, cfg)
        for a, b in zip(jax.tree.leaves((params, stats)),
                        jax.tree.leaves((params2, stats2))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        td = TDiscriminator()
        td.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()}, strict=True)
        td.eval()
        xs = rng.standard_normal((2, cfg.np, 3)).astype(np.float32)
        ours = D.apply({"params": v["params"], "batch_stats":
                        v["batch_stats"]}, jnp.array(xs), train=False)
        with torch.no_grad():
            ref = td(torch.tensor(xs).transpose(2, 1)).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)

    def test_save_reference_checkpoint_file(self, cfg, rng, tmp_path):
        from sp_gan_tpu.compat import (load_reference_checkpoint,
                                       save_reference_checkpoint)
        _, params, stats = self._init_generator(cfg, rng)
        gp = str(tmp_path / "G.pth")
        save_reference_checkpoint(
            gp, jax.tree.map(np.asarray, params),
            jax.tree.map(np.asarray, stats), cfg, epoch=7)
        (params2, stats2), _, epoch = load_reference_checkpoint(gp, cfg)
        assert epoch == 7
        for a, b in zip(jax.tree.leaves((params, stats)),
                        jax.tree.leaves((params2, stats2))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
