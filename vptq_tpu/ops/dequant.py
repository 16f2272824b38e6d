"""Pure-jnp VPTQ weight reconstruction (the correctness anchor).

Re-implements, op-for-op, the reference's pure-torch fallback
``dequant`` (reference: vptq/ops/quant_gemm.py:43-158) on normalized
index planes. It serves three roles, mirroring how the reference uses
its torch fallback:

  * oracle for the fused Pallas kernels (compared under the reference's
    own tolerance recipe, tests/test_quant_gemv.py:174-194),
  * interpreter-friendly fallback on hosts without TPUs,
  * the prefill building block (dequantize tile + MXU matmul).

Index tensors here are already *normalized*: integer planes, packed
streams unpacked, dtype views undone (see ``vptq_tpu.ops.packing``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from vptq_tpu.config import VQLinearConfig

__all__ = ["dequant_weight", "reconstruct_main", "reconstruct_outlier"]


def _gather_vectors(codebook, ids, xp=jnp):
    """Gather codebook vectors and lay them out as weight rows.

    codebook (C, K, v); ids (C, rows, group_size) int.
    Returns (rows * v, C * group_size): entry [o, c*G+g] is
    ``codebook[c, ids[c, o // v, g], o % v]`` — the layout produced by
    the reference's gather/permute dance (quant_gemm.py:92-103).

    ``xp`` selects the array backend: jnp for on-device, numpy for
    host-side checkpoint conversion (XLA gather on TPU runs at only
    ~0.36 G ids/s; numpy is ~100x faster for the one-time re-encode).
    """
    num_codebooks, rows, group_size = ids.shape
    v = codebook.shape[-1]
    # (C, rows, G, v)
    selected = xp.take_along_axis(
        codebook[:, None, :, :],  # (C, 1, K, v)
        ids[..., None],  # (C, rows, G, 1)
        axis=2,
    )
    # rows of W run along out_features with vectors of length v
    # (vector_quant_dim == "out"): transpose (C, rows, v, G).
    selected = selected.transpose(0, 1, 3, 2)
    selected = selected.reshape(num_codebooks, rows * v, group_size)
    selected = selected.transpose(1, 0, 2)
    return selected.reshape(rows * v, num_codebooks * group_size)


def reconstruct_main(
    centroids,
    ids,
    res_centroids,
    res_ids,
    cfg: VQLinearConfig,
    xp=jnp,
):
    """Main (+ residual) weight block, padding rows removed.

    Shape (out_features, num_codebooks * group_size).
    """
    qweight = _gather_vectors(centroids, ids, xp)
    if cfg.enable_residual:
        qweight = qweight + _gather_vectors(res_centroids, res_ids, xp)
    if cfg.padding > 0:
        qweight = qweight[: -cfg.padding, :]  # quant_gemm.py:123-124
    return qweight


def reconstruct_outlier(
    outlier_centroids,
    outlier_ids,
    cfg: VQLinearConfig,
    xp=jnp,
):
    """Outlier weight block (out_features, outlier_size).

    The outlier component covers the first ``outlier_size`` input
    columns and is concatenated in front of the main block
    (quant_gemm.py:126-149).
    """
    block = _gather_vectors(outlier_centroids, outlier_ids, xp)
    if cfg.outlier_padding > 0:
        block = block[: -cfg.outlier_padding, :]
    return block


def dequant_weight(
    centroids: jnp.ndarray,
    ids: jnp.ndarray,
    res_centroids: Optional[jnp.ndarray] = None,
    res_ids: Optional[jnp.ndarray] = None,
    outlier_centroids: Optional[jnp.ndarray] = None,
    outlier_ids: Optional[jnp.ndarray] = None,
    inv_perm: Optional[jnp.ndarray] = None,
    weight_scale: Optional[jnp.ndarray] = None,
    weight_bias: Optional[jnp.ndarray] = None,
    *,
    cfg: VQLinearConfig,
    xp=jnp,
):
    """Reconstruct the full weight matrix ``W`` of shape (out, in).

    Matches reference quant_gemm.py:43-158 given the same inputs. Note
    ``inv_perm`` is the *inverse* permutation (argsort of the stored
    ``perm``), precomputed once at load time rather than per call.
    """
    qweight = reconstruct_main(
        centroids, ids, res_centroids, res_ids, cfg, xp
    )

    if cfg.enable_outlier:
        outlier_block = reconstruct_outlier(
            outlier_centroids, outlier_ids, cfg, xp
        )
        qweight = xp.concatenate([outlier_block, qweight], axis=1)

    if inv_perm is not None:
        qweight = qweight[:, inv_perm]  # quant_gemm.py:151-153

    if cfg.enable_norm:
        qweight = (
            qweight * weight_scale[None, :] + weight_bias[None, :]
        )  # quant_gemm.py:155-156

    return qweight
