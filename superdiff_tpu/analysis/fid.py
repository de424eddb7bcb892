"""Fréchet distance evaluation between image sets.

The reference publishes no FID machinery (SURVEY.md §6) but the north-star
metric requires "FID parity on TB/pneumonia test sets". Standard FID uses
InceptionV3 pool features; with no network egress this module computes the
Fréchet distance over *any* FeatureExtractor backend (diffusion-bottleneck
features by default) — the math is identical, and with an Inception
checkpoint on disk the torch backend reproduces standard FID.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from superdiff_tpu.analysis.features import FeatureExtractor, \
    extract_features


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a symmetric PSD matrix via eigendecomposition
    (no scipy dependency; covariance products are symmetrized first)."""
    vals, vecs = np.linalg.eigh(mat)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray) -> float:
    """FID formula: ||mu1-mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^(1/2)).

    ``(S1 S2)^{1/2}`` is computed as ``S1^{1/2} (S1^{1/2} S2 S1^{1/2})^{1/2}
    S1^{-1/2}`` trace-equivalently via the symmetric product — numerically
    stable for PSD covariances.
    """
    diff = mu1 - mu2
    s1_half = _sqrtm_psd(sigma1)
    inner = _sqrtm_psd(s1_half @ sigma2 @ s1_half)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(inner))


def _stats(feats: np.ndarray):
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def compute_fid(extractor: FeatureExtractor,
                real_batches: Iterable,
                generated_batches: Iterable,
                max_samples: int = 300) -> float:
    """Fréchet distance between real and generated image sets under the
    given feature extractor."""
    real_f, _ = extract_features(extractor, real_batches, max_samples)
    gen_f, _ = extract_features(extractor, generated_batches, max_samples)
    if len(real_f) < 2 or len(gen_f) < 2:
        raise ValueError("need >= 2 samples per set for covariance")
    return frechet_distance(*_stats(real_f), *_stats(gen_f))
