"""Pallas TPU kernels for the hot graph ops.

These replace the reference's CUDA extensions *and* beat the naive XLA
lowerings by streaming over VMEM tiles instead of materializing O(N^2)
intermediates in HBM:

  knn.py      fused pairwise-distance + top-k selection (the EdgeConv
              front-end; reference builds a [B,N,N] matrix + full sort,
              `Generation/modules.py:694-703`)
  chamfer.py  fused bidirectional NN-distance reduction (reference
              `metrics/CD_EMD/cd/chamferdist/chamfer.cu`)

Every kernel has an XLA twin in `sp_gan_tpu.ops`; `tests/test_pallas.py`
compares them (interpret mode on CPU, compiled on TPU).
"""

from sp_gan_tpu.ops.pallas.knn import knn_pallas
from sp_gan_tpu.ops.pallas.chamfer import chamfer_pallas

__all__ = ["knn_pallas", "chamfer_pallas"]
