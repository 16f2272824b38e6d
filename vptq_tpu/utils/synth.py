"""Synthetic VPTQ layer/checkpoint generation.

Used by the test-suite (seeded random codebooks/indices, the recipe of
reference tests/test_quant_gemv.py:112-171), by ``bench.py`` (building
model-shaped synthetic weights when real community checkpoints are not
downloadable), and by the checkpoint round-trip tests.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from vptq_tpu.config import VQLinearConfig
from vptq_tpu.layers.vqlinear import VQLinear
from vptq_tpu.ops.packing import index_plane_dtype, pack_index

__all__ = ["make_config", "make_numpy_planes", "make_layer", "planes_to_layer"]


def make_config(
    in_features: int = 256,
    out_features: int = 128,
    vector_len: int = 8,
    num_centroids: int = 256,
    num_res_centroids: int = -1,
    num_codebooks: int = 1,
    outlier_size: int = 0,
    outlier_vector_len: int = -1,
    num_outlier_centroids: int = -1,
    enable_norm: bool = False,
    enable_perm: bool = False,
    is_indice_packed: bool = False,
    bias: bool = False,
) -> VQLinearConfig:
    inlier = in_features - max(outlier_size, 0)
    if inlier % num_codebooks:
        raise ValueError("inlier columns must divide num_codebooks")
    return VQLinearConfig(
        in_features=in_features,
        out_features=out_features,
        vector_lens=(outlier_vector_len, vector_len),
        num_centroids=(num_outlier_centroids, num_centroids),
        num_res_centroids=(-1, num_res_centroids),
        group_num=num_codebooks,
        group_size=inlier // num_codebooks,
        outlier_size=outlier_size,
        indices_as_float=False,
        enable_norm=enable_norm,
        enable_perm=enable_perm,
        is_indice_packed=is_indice_packed,
        bias=bias,
    )


def make_numpy_planes(
    cfg: VQLinearConfig,
    seed: int = 1234,
    dtype=np.float32,
    mean: float = 2e-2,
    std: float = 0.5,
    heavy_tailed: bool = False,
) -> Dict[str, Optional[np.ndarray]]:
    """Random normalized parameter planes for one layer.

    ``heavy_tailed``: draw realistic LLM-like statistics instead of
    Gaussian (VERDICT r4 item 2 — every fidelity number was
    synthetic-Gaussian before):

      * centroid components from Student-t (df=4, variance-matched)
        — published LLM weight marginals have kurtosis well above
        Gaussian (df ~3-5 fits the reported excess);
      * per-input-channel ``weight_scale`` lognormal (sigma=0.5) with
        ~0.8% scattered outlier channels boosted 4-10x — the
        structured channel-outlier pattern (massive activations /
        salient channels) that group-quantizers degrade on most.

    The exact dequant of such a layer is
    ``centroid_t4 * lognormal_channel_scale`` per element: heavy
    marginal tails AND per-channel structure.
    """
    rng = np.random.default_rng(seed)

    def gauss(shape):
        return (mean + std * rng.standard_normal(shape)).astype(dtype)

    def normal(shape):
        if heavy_tailed:
            # t(df=4) has variance df/(df-2)=2 — rescale to std
            t = rng.standard_t(4, size=shape) / np.sqrt(2.0)
            return (mean + std * t).astype(dtype)
        return gauss(shape)

    c, k, v = cfg.num_codebooks, cfg.num_main_centroids, cfg.vector_len
    planes: Dict[str, Optional[np.ndarray]] = {
        "centroids": normal((c, k, v)),
        "ids": rng.integers(
            0, k, size=(c, cfg.num_indices, cfg.group_size)
        ).astype(index_plane_dtype(k)),
        "res_centroids": None,
        "res_ids": None,
        "outlier_centroids": None,
        "outlier_ids": None,
        "perm": None,
        "weight_scale": None,
        "weight_bias": None,
        "bias": None,
    }
    if cfg.enable_residual:
        kr = cfg.num_main_res_centroids
        planes["res_centroids"] = normal((c, kr, v))
        planes["res_ids"] = rng.integers(
            0, kr, size=(c, cfg.num_indices, cfg.group_size)
        ).astype(index_plane_dtype(kr))
    if cfg.enable_outlier:
        ko, vo = cfg.num_outlier_centroids, cfg.outlier_vector_len
        planes["outlier_centroids"] = normal((1, ko, vo))
        planes["outlier_ids"] = rng.integers(
            0, ko, size=(1, cfg.outlier_num_indices, cfg.outlier_size)
        ).astype(index_plane_dtype(ko))
    if cfg.enable_perm:
        planes["perm"] = rng.permutation(cfg.in_features).astype(np.uint16)
    if cfg.enable_norm:
        if heavy_tailed:
            ws = np.exp(
                0.5 * rng.standard_normal(cfg.in_features)
            ).astype(np.float64)
            n_out = max(4, cfg.in_features // 128)
            sel = rng.choice(cfg.in_features, n_out, replace=False)
            ws[sel] *= rng.uniform(4.0, 10.0, n_out)
            planes["weight_scale"] = ws.astype(dtype)
        else:
            planes["weight_scale"] = (
                1.0 + 0.1 * rng.standard_normal(cfg.in_features)
            ).astype(dtype)
        planes["weight_bias"] = (
            0.05 * rng.standard_normal(cfg.in_features)
        ).astype(dtype)
    if cfg.bias:
        planes["bias"] = normal((cfg.out_features,))
    return planes


def planes_to_layer(
    planes: Dict[str, Optional[np.ndarray]],
    cfg: VQLinearConfig,
    dtype=jnp.float32,
) -> VQLinear:
    """Build the runtime :class:`VQLinear` pytree from numpy planes."""

    def arr(x, d=None):
        if x is None:
            return None
        return jnp.asarray(x, dtype=d)

    perm = planes.get("perm")
    inv_perm = (
        None
        if perm is None
        else jnp.asarray(np.argsort(perm.astype(np.int64)), dtype=jnp.int32)
    )
    return VQLinear(
        centroids=arr(planes["centroids"], dtype),
        ids=arr(planes["ids"]),
        res_centroids=arr(planes["res_centroids"], dtype),
        res_ids=arr(planes["res_ids"]),
        outlier_centroids=arr(planes["outlier_centroids"], dtype),
        outlier_ids=arr(planes["outlier_ids"]),
        inv_perm=inv_perm,
        weight_scale=arr(planes["weight_scale"], dtype),
        weight_bias=arr(planes["weight_bias"], dtype),
        bias=arr(planes["bias"], dtype),
        cfg=cfg,
    )


def make_layer(
    cfg: VQLinearConfig, seed: int = 1234, dtype=jnp.float32
) -> VQLinear:
    np_dtype = np.dtype(jnp.dtype(dtype).name) if jnp.dtype(
        dtype
    ) != jnp.bfloat16 else np.float32
    planes = make_numpy_planes(cfg, seed=seed, dtype=np_dtype)
    return planes_to_layer(planes, cfg, dtype=dtype)


def reference_dequant_kwargs(
    planes: Dict[str, Optional[np.ndarray]], cfg: VQLinearConfig
):
    """Torch kwargs for the reference fallback ``dequant``
    (reference vptq/ops/quant_gemm.py:43-69), reproducing the
    checkpoint dtype-view semantics (vqlinear.py:110-113)."""
    import torch

    def as_viewed_u16(x):
        # uint16 payload viewed as int16, as stored in checkpoints
        return torch.from_numpy(
            x.astype(np.uint16).view(np.int16).copy()
        )

    def t(x):
        return None if x is None else torch.from_numpy(np.asarray(x))

    if cfg.is_indice_packed:
        ids64 = planes["ids"].astype(np.int64)
        res64 = (
            planes["res_ids"].astype(np.int64)
            if planes["res_ids"] is not None
            else None
        )
        packed = pack_index(
            ids64, cfg.index_bits, res64, cfg.res_index_bits
        )
        indices = torch.from_numpy(packed)
        res_indices = None
    else:
        indices = as_viewed_u16(planes["ids"])
        res_indices = (
            as_viewed_u16(planes["res_ids"])
            if planes["res_ids"] is not None
            else None
        )

    return dict(
        indices=indices,
        centroids=t(planes["centroids"]),
        outlier_indices=(
            as_viewed_u16(planes["outlier_ids"])
            if planes["outlier_ids"] is not None
            else None
        ),
        outlier_centroids=t(planes["outlier_centroids"]),
        res_indices=res_indices,
        res_centroids=t(planes["res_centroids"]),
        perm=(
            as_viewed_u16(planes["perm"])
            if planes["perm"] is not None
            else None
        ),
        weight_scale=t(planes["weight_scale"]),
        weight_bias=t(planes["weight_bias"]),
        is_indice_packed=cfg.is_indice_packed,
        enable_outlier=cfg.enable_outlier,
        enable_residual=cfg.enable_residual,
        enable_perm=cfg.enable_perm,
        enable_norm=cfg.enable_norm,
        num_centroids=cfg.num_main_centroids,
        num_outlier_centroids=cfg.num_outlier_centroids,
        num_res_centroids=cfg.num_main_res_centroids,
        padding=cfg.padding,
        outlier_padding=cfg.outlier_padding,
        num_codebooks=cfg.num_codebooks,
        group_size=cfg.group_size,
        outlier_size=cfg.outlier_size,
        vector_len=cfg.vector_len,
        outlier_vector_len=cfg.outlier_vector_len,
    )
