"""End-to-end reference-checkpoint import: torch .pth -> converter CLI flow ->
our checkpoint -> Manipulator generation, outputs matching the torch model."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest
import torch

from sp_gan_tpu.config import Config
from sp_gan_tpu.compat import load_reference_checkpoint
from sp_gan_tpu.manipulate import Manipulator
from tests.test_torch_parity import TGenerator, TDiscriminator


@pytest.fixture(scope="module")
def pth_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("ref")
    tg = TGenerator(nz=16, k=4).eval()
    td = TDiscriminator().eval()
    g_path = str(d / "300_Chair_G.pth")
    d_path = str(d / "300_Chair_D.pth")
    torch.save({"G_model": tg.state_dict(), "G_optimizer": {},
                "G_epoch": 300}, g_path)
    torch.save({"D_model": td.state_dict(), "D_optimizer": {},
                "D_epoch": 300}, d_path)
    return tg, g_path, d_path


class TestReferenceImport:
    def test_load_reference_checkpoint(self, pth_files):
        tg, g_path, d_path = pth_files
        cfg = Config(np=32, nk=8, nz=16, dtype="float32")
        (gp, gs), dpair, epoch = load_reference_checkpoint(g_path, cfg, d_path)
        assert epoch == 300
        assert dpair is not None
        assert gp["head1"]["kernel"].shape == (19, 128)

    def test_imported_weights_generate_matching_outputs(self, pth_files):
        tg, g_path, d_path = pth_files
        cfg = Config(np=32, nk=8, nz=16, dtype="float32", use_pallas=False)
        (gp, gs), _, _ = load_reference_checkpoint(g_path, cfg)
        man = Manipulator(cfg, gp, gs)
        x = man.sphere[None]
        rng = np.random.default_rng(0)
        z = np.broadcast_to(
            (0.2 * rng.standard_normal((1, 1, 16))).astype(np.float32),
            (1, 32, 16)).copy()
        ours = man.forward(jax.numpy.asarray(z))
        with torch.no_grad():
            ref = tg(torch.tensor(np.asarray(x)),
                     torch.tensor(z)).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, ref, atol=5e-4)
