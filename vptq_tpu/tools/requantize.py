"""Nearest-centroid re-quantization of dense weights.

Counterpart of the reference's ``set_l2_indices`` debug/finetune helper
(reference: vqlinear.py:455-483): given a dense weight matrix and a
layer's existing codebooks, find the L2-nearest main (and residual)
centroid indices. Useful for diagnostics and for re-quantizing
fine-tuned weights against published codebooks. Host-side numpy.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from vptq_tpu.config import VQLinearConfig

__all__ = ["nearest_indices", "requantize"]


def nearest_indices(
    vectors: np.ndarray,  # (N, v)
    centroids: np.ndarray,  # (K, v)
    batch_size: int = 16384,
) -> np.ndarray:
    """argmin_k ||vec - centroid_k||^2 per vector (batched)."""
    vectors = np.asarray(vectors, np.float32)
    centroids = np.asarray(centroids, np.float32)
    c_sq = np.sum(centroids**2, axis=1)  # (K,)
    out = np.empty(len(vectors), np.int64)
    for start in range(0, len(vectors), batch_size):
        vb = vectors[start: start + batch_size]
        # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2; ||v||^2 constant per row
        dots = vb @ centroids.T
        out[start: start + len(vb)] = np.argmin(
            c_sq[None, :] - 2 * dots, axis=1
        )
    return out


def requantize(
    weight: np.ndarray,  # (out, in) — pre-norm weight (no scale/bias)
    centroids: np.ndarray,  # (C, K, v)
    res_centroids: Optional[np.ndarray],  # (C, Kr, v)
    cfg: VQLinearConfig,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """L2-nearest (main_ids, res_ids) for ``weight``.

    Only the single-codebook, no-outlier case is supported (the same
    restriction as the reference helper, vqlinear.py:455-483 which
    indexes codebook 0). Weight rows are grouped into ``vector_len``
    vectors along out_features, padded as in the checkpoint layout.
    """
    if cfg.num_codebooks != 1:
        raise NotImplementedError("requantize supports one codebook")
    if cfg.enable_outlier:
        raise NotImplementedError("outlier requantization unsupported")

    v = cfg.vector_len
    w = np.asarray(weight, np.float32)
    if cfg.padding:
        w = np.pad(w, ((0, cfg.padding), (0, 0)))
    # (out_padded, in) -> vectors along out: (in * out/v, v)
    wt = w.T  # (in, out_padded)
    vecs = wt.reshape(-1, v)

    main = nearest_indices(vecs, centroids[0])
    res = None
    if res_centroids is not None:
        residual = vecs - centroids[0][main]
        res = nearest_indices(residual, res_centroids[0])

    # reshape to (1, num_indices, group_size): vecs are ordered
    # (in, out_vec) -> transpose to (out_vec, in)
    main = main.reshape(cfg.in_features, cfg.num_indices).T[None]
    if res is not None:
        res = res.reshape(cfg.in_features, cfg.num_indices).T[None]
    return main, res
