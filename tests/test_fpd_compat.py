"""FPD trained-weight import (VERDICT r1 #4): activation parity between a
torch replica of the reference protocol's DGCNN-cls extractor
(antao97/UnsupervisedPointCloudReconstruction, loaded by
`Common/GAN_metrics.py:125-182`) and our `DGCNNFeat` after
`compat.convert_dgcnn` — same style as tests/test_torch_parity.py: build the
torch module with its own (random) init, convert the state_dict, compare
outputs. When the real `Classify_dgcnn_cls_k40_1024_b32.pkl` is available,
`FPD.from_torch(path)` uses the identical key-map."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sp_gan_tpu.compat import convert_dgcnn  # noqa: E402
from sp_gan_tpu.eval.dgcnn import DGCNNFeat  # noqa: E402
from sp_gan_tpu.eval.fpd import FPD  # noqa: E402


def torch_knn(x, k):
    """antao97 model.py `knn`: topk over -pairwise-dist — SELF-INCLUSIVE."""
    inner = -2 * torch.matmul(x.transpose(2, 1), x)
    xx = torch.sum(x ** 2, dim=1, keepdim=True)
    pairwise = -xx - inner - xx.transpose(2, 1)
    return pairwise.topk(k=k, dim=-1)[1]                  # [B, N, k]


def torch_graph_feature(x, k):
    """antao97 `get_graph_feature`: edge features ordered (diff, central)."""
    B, C, N = x.size()
    idx = torch_knn(x, k)
    idx_base = torch.arange(0, B).view(-1, 1, 1) * N
    idx = (idx + idx_base).view(-1)
    xt = x.transpose(2, 1).contiguous()                   # [B, N, C]
    feature = xt.view(B * N, -1)[idx, :].view(B, N, k, C)
    xt = xt.view(B, N, 1, C).repeat(1, 1, k, 1)
    feature = torch.cat((feature - xt, xt), dim=3)        # (diff, central)
    return feature.permute(0, 3, 1, 2)                    # [B, 2C, N, k]


class TorchDGCNNEncoder(tnn.Module):
    """Replica of antao97's DGCNN_Cls_Encoder (the weights' architecture),
    with the reference's `encoder.` prefix in the state_dict."""

    def __init__(self, k=40, feat_dims=1024):
        super().__init__()
        self.k = k
        mk = lambda cin, cout, bn: tnn.Sequential(
            tnn.Conv2d(cin, cout, kernel_size=1, bias=False) if bn == 2
            else tnn.Conv1d(cin, cout, kernel_size=1, bias=False),
            tnn.BatchNorm2d(cout) if bn == 2 else tnn.BatchNorm1d(cout),
            tnn.LeakyReLU(negative_slope=0.2))
        self.conv1 = mk(6, 64, 2)
        self.conv2 = mk(128, 64, 2)
        self.conv3 = mk(128, 128, 2)
        self.conv4 = mk(256, 256, 2)
        self.conv5 = mk(512, feat_dims, 1)

    def forward(self, pts):                               # pts [B, N, 3]
        x = pts.transpose(2, 1)                           # [B, 3, N]
        feats = []
        for conv in (self.conv1, self.conv2, self.conv3, self.conv4):
            g = torch_graph_feature(x, self.k)
            g = conv(g)
            x = g.max(dim=-1, keepdim=False)[0]           # [B, C, N]
            feats.append(x)
        x = torch.cat(feats, dim=1)                       # [B, 512, N]
        x = self.conv5(x)
        return x.max(dim=-1, keepdim=False)[0]            # [B, feat]


@pytest.fixture(scope="module")
def replica():
    torch.manual_seed(0)
    m = TorchDGCNNEncoder(k=8, feat_dims=64)
    # non-trivial running stats (fresh BN has mean=0/var=1 — too forgiving)
    m.train()
    with torch.no_grad():
        for _ in range(3):
            m(torch.randn(4, 64, 3))
    m.eval()
    return m


class TestDGCNNConvert:
    def test_activation_parity(self, replica):
        sd = {f"encoder.{k}": v for k, v in replica.state_dict().items()}
        sd["classifier.linear1.weight"] = torch.zeros(2, 2)  # must be dropped
        variables = convert_dgcnn(sd)

        rng = np.random.default_rng(0)
        pts = rng.standard_normal((4, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = replica(torch.from_numpy(pts)).numpy()

        model = DGCNNFeat(k=8, feat_dims=64)
        got = np.asarray(model.apply(variables, jnp.asarray(pts),
                                     train=False))
        assert got.shape == ref.shape
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
        assert rel < 2e-3, f"activation rel diff {rel}"

    def test_fpd_with_converted_weights(self, replica):
        sd = {f"encoder.{k}": v for k, v in replica.state_dict().items()}
        variables = convert_dgcnn(sd)
        fpd = FPD(variables, k=8, feat_dims=64, batch_size=8)
        assert not fpd.random_features
        rng = np.random.default_rng(1)
        a = rng.standard_normal((12, 64, 3)).astype(np.float32)
        b = a + 0.5 * rng.standard_normal(a.shape).astype(np.float32)
        same = fpd(a, a)
        diff = fpd(a, b)
        assert abs(same) < 1e-3
        assert diff > same and np.isfinite(diff)

    def test_from_torch_roundtrip(self, replica, tmp_path):
        p = str(tmp_path / "dgcnn.pkl")
        torch.save({f"encoder.{k}": v
                    for k, v in replica.state_dict().items()}, p)
        fpd = FPD.from_torch(p, k=8, feat_dims=64)
        assert not fpd.random_features
        acts = fpd.activations(np.zeros((2, 64, 3), np.float32))
        assert acts.shape == (2, 64)
