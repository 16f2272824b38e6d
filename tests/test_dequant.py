"""jnp dequant vs the reference's pure-torch dequant, over the full
flag lattice (residual/outlier/perm/norm/multi-codebook/padding) —
the silent-wrongness traps called out in SURVEY.md §7."""

import numpy as np
import pytest

from vptq_tpu.ops.dequant import dequant_weight
from vptq_tpu.utils.synth import (
    make_config,
    make_numpy_planes,
    planes_to_layer,
    reference_dequant_kwargs,
)

CONFIGS = [
    # name, kwargs for make_config
    ("plain", dict()),
    ("residual", dict(num_res_centroids=16)),
    (
        "outlier",
        dict(
            outlier_size=32,
            outlier_vector_len=4,
            num_outlier_centroids=64,
            num_res_centroids=-1,
        ),
    ),
    ("perm", dict(enable_perm=True)),
    ("norm", dict(enable_norm=True)),
    ("padding", dict(out_features=124, vector_len=8)),
    ("two_codebooks", dict(num_codebooks=2)),
    (
        "everything",
        dict(
            in_features=160,
            out_features=92,
            vector_len=8,
            num_centroids=512,
            num_res_centroids=32,
            outlier_size=32,
            outlier_vector_len=4,
            num_outlier_centroids=64,
            enable_perm=True,
            enable_norm=True,
        ),
    ),
    (
        "everything_packed",
        dict(
            in_features=160,
            out_features=92,
            vector_len=8,
            num_centroids=512,
            num_res_centroids=32,
            outlier_size=32,
            outlier_vector_len=4,
            num_outlier_centroids=64,
            enable_perm=True,
            enable_norm=True,
            is_indice_packed=True,
        ),
    ),
    (
        "flagship_geometry",  # v8-k65536 + 256-residual, scaled down rows
        dict(
            in_features=256,
            out_features=64,
            vector_len=8,
            num_centroids=65536,
            num_res_centroids=256,
            enable_norm=True,
            is_indice_packed=True,
        ),
    ),
]


@pytest.mark.parametrize(
    "kwargs", [c[1] for c in CONFIGS], ids=[c[0] for c in CONFIGS]
)
def test_dequant_matches_reference(kwargs):
    torch = pytest.importorskip("torch")
    from oracle import load_reference_ops

    _, ref_ops = load_reference_ops()

    cfg = make_config(**kwargs)
    planes = make_numpy_planes(cfg, seed=42)

    ref_kwargs = reference_dequant_kwargs(planes, cfg)
    ref_w = ref_ops.dequant(**ref_kwargs).numpy()

    layer = planes_to_layer(planes, cfg)
    our_w = np.asarray(
        dequant_weight(
            centroids=layer.centroids,
            ids=layer.ids.astype(np.int32),
            res_centroids=layer.res_centroids,
            res_ids=None
            if layer.res_ids is None
            else layer.res_ids.astype(np.int32),
            outlier_centroids=layer.outlier_centroids,
            outlier_ids=None
            if layer.outlier_ids is None
            else layer.outlier_ids.astype(np.int32),
            inv_perm=layer.inv_perm,
            weight_scale=layer.weight_scale,
            weight_bias=layer.weight_bias,
            cfg=cfg,
        )
    )

    assert our_w.shape == (cfg.out_features, cfg.in_features)
    np.testing.assert_allclose(our_w, ref_w, rtol=1e-5, atol=1e-5)


def test_quant_matmul_matches_linear():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from oracle import load_reference_ops

    _, ref_ops = load_reference_ops()

    cfg = make_config(
        in_features=160,
        out_features=96,
        num_res_centroids=32,
        outlier_size=32,
        outlier_vector_len=4,
        num_outlier_centroids=64,
        enable_perm=True,
        enable_norm=True,
        bias=True,
    )
    planes = make_numpy_planes(cfg, seed=3)
    layer = planes_to_layer(planes, cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, cfg.in_features)).astype(np.float32)

    ref_w = ref_ops.dequant(**reference_dequant_kwargs(planes, cfg))
    ref_y = F.linear(
        torch.from_numpy(x), ref_w, torch.from_numpy(planes["bias"])
    ).numpy()

    our_y = np.asarray(layer(x))
    np.testing.assert_allclose(our_y, ref_y, rtol=2e-4, atol=2e-4)
