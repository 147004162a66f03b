"""Model layer: flax.linen modules, channel-last ([B, N, C]) throughout.

Rebuilds the live model surface of the reference —
`/root/reference/Generation/Generator.py`, `Discriminator.py`, and the live
subset of `modules.py` — as TPU-idiomatic layers: every 1x1 Conv1d/Conv2d
becomes a Dense over the trailing channel axis (one MXU matmul per layer over
B*N rows), the per-batch gather loop becomes `ops.edge_features`, and norm
statistics are computed with fused XLA reductions.
"""

from sp_gan_tpu.nn.layers import (
    TorchDense,
    EqualDense,
    instance_norm_points,
    AdaptivePointNorm,
    EdgeBlock,
    Attention,
)
from sp_gan_tpu.nn.generator import Generator
from sp_gan_tpu.nn.discriminator import Discriminator

__all__ = [
    "TorchDense", "EqualDense", "instance_norm_points", "AdaptivePointNorm",
    "EdgeBlock", "Attention", "Generator", "Discriminator",
]
