"""Fréchet Point Distance (FPD).

Rebuild of `/root/reference/Common/GAN_metrics.py:437-547`: DGCNN activations
-> (mu, sigma) -> Fréchet distance, optionally against precomputed statistics
(`pre_statistics_*.npz`, reference `--FPD_path`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sp_gan_tpu.eval.dgcnn import DGCNNFeat


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID formula (GAN_metrics.py:484-534): ||mu1-mu2||^2 + Tr(s1 + s2 -
    2 sqrt(s1 s2))."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(f"Imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def activation_statistics(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    acts = np.asarray(acts)
    return acts.mean(axis=0), np.cov(acts, rowvar=False)


class FPD:
    """FPD evaluator. Provide either trained extractor variables or rely on a
    randomly-initialized DGCNN (random-feature FD — still a valid two-sample
    statistic, clearly labeled; load converted reference weights for
    checkpoint-comparable numbers)."""

    def __init__(self, variables=None, k: int = 40, feat_dims: int = 1024,
                 batch_size: int = 32, seed: int = 0):
        self.model = DGCNNFeat(k=k, feat_dims=feat_dims)
        if variables is None:
            dummy = jnp.zeros((1, 128, 3))
            variables = self.model.init(jax.random.PRNGKey(seed), dummy)
            self.random_features = True
        else:
            self.random_features = False
        self.variables = variables
        self.batch_size = batch_size
        self._apply = jax.jit(
            lambda v, pc: self.model.apply(v, pc, train=False))

    def activations(self, clouds) -> np.ndarray:
        clouds = np.asarray(clouds, np.float32)
        outs = []
        for lo in range(0, len(clouds), self.batch_size):
            batch = jnp.asarray(clouds[lo:lo + self.batch_size])
            outs.append(np.asarray(self._apply(self.variables, batch)))
        return np.concatenate(outs, axis=0)

    def __call__(self, gen_clouds, ref_clouds=None,
                 stats_path: Optional[str] = None) -> float:
        """FPD between generated clouds and either reference clouds or a
        precomputed stats file (npz with mu/sigma, reference `--FPD_path`)."""
        mu1, s1 = activation_statistics(self.activations(gen_clouds))
        if stats_path is not None:
            blob = np.load(stats_path)
            mu2 = blob["mu"] if "mu" in blob else blob["m"]
            s2 = blob["sigma"] if "sigma" in blob else blob["s"]
        else:
            assert ref_clouds is not None
            mu2, s2 = activation_statistics(self.activations(ref_clouds))
        return frechet_distance(mu1, s1, mu2, s2)

    @classmethod
    def from_torch(cls, weights_path: str, k: int = 40,
                   feat_dims: int = 1024, batch_size: int = 32) -> "FPD":
        """Checkpoint-comparable FPD: load the reference protocol's external
        DGCNN classifier weights (`Classify_dgcnn_cls_k40_1024_b32.pkl`,
        GAN_metrics.py:158) through the compat key-map."""
        from sp_gan_tpu.compat import load_dgcnn_weights
        return cls(load_dgcnn_weights(weights_path), k=k,
                   feat_dims=feat_dims, batch_size=batch_size)

    def save_statistics(self, clouds, path: str):
        mu, sigma = activation_statistics(self.activations(clouds))
        np.savez(path, mu=mu, sigma=sigma)
