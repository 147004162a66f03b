"""Evaluation suite: generative metrics (JSD / MMD / COV / 1-NN over CD & EMD)
and FPD — reference `/root/reference/Common/loss_utils.py:261-473`,
`Common/GAN_metrics.py`, `metrics/evaluation_metrics.py` (triplicated there;
unified here)."""

from sp_gan_tpu.eval.metrics import (
    pairwise_cd_matrix,
    pairwise_emd_matrix,
    coverage,
    mmd,
    knn_two_sample,
    jsd,
    f_score,
    compute_all_metrics,
    per_class_metrics,
)
from sp_gan_tpu.eval.fpd import frechet_distance, FPD

__all__ = [
    "pairwise_cd_matrix", "pairwise_emd_matrix", "coverage", "mmd",
    "knn_two_sample", "jsd", "f_score", "compute_all_metrics",
    "per_class_metrics", "frechet_distance", "FPD",
]
