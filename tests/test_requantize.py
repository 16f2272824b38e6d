"""L2 re-quantization: recovering indices from a reconstructed weight."""

import numpy as np

from vptq_tpu.models.walk import named_linears
from vptq_tpu.ops.dequant import dequant_weight
from vptq_tpu.tools.requantize import nearest_indices, requantize
from vptq_tpu.utils.synth import make_config, make_numpy_planes


def test_nearest_indices_exact():
    rng = np.random.default_rng(0)
    centroids = rng.standard_normal((32, 4)).astype(np.float32)
    ids = rng.integers(0, 32, size=100)
    vecs = centroids[ids]
    got = nearest_indices(vecs, centroids)
    # exact centroid vectors must map back to themselves (up to ties)
    np.testing.assert_array_equal(centroids[got], centroids[ids])


def test_requantize_recovers_indices():
    cfg = make_config(
        in_features=48, out_features=24, vector_len=4,
        num_centroids=64, num_res_centroids=-1,
    )
    planes = make_numpy_planes(cfg, seed=7)
    w = dequant_weight(
        centroids=planes["centroids"],
        ids=planes["ids"].astype(np.int64),
        cfg=cfg,
        xp=np,
    )
    main, res = requantize(w, planes["centroids"], None, cfg)
    assert res is None
    # reconstruction from recovered indices must match exactly
    w2 = dequant_weight(
        centroids=planes["centroids"], ids=main.astype(np.int64),
        cfg=cfg, xp=np,
    )
    np.testing.assert_allclose(w2, w, rtol=1e-6, atol=1e-6)


def test_named_linears_walks_everything(tmp_path):
    import jax.numpy as jnp

    from vptq_tpu.models import load_model
    from vptq_tpu.utils.synth_checkpoint import (
        tiny_model_config,
        write_synthetic_checkpoint,
    )

    write_synthetic_checkpoint(
        tmp_path, tiny_model_config(),
        vq_kwargs=dict(vector_len=4, num_centroids=64,
                       num_res_centroids=16, is_indice_packed=True),
        seed=121,
    )
    model = load_model(str(tmp_path), dtype=jnp.float32)
    names = [n for n, _ in named_linears(model)]
    # 2 layers x 7 projections, tied lm_head
    assert len(names) == 14
    assert "model.layers.0.self_attn.q_proj" in names
    assert "model.layers.1.mlp.down_proj" in names
