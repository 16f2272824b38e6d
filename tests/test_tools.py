"""Offline tooling: absorb_perm / pack / unpack round-trips preserve
the reconstructed weights exactly."""

import numpy as np

import jax.numpy as jnp

from vptq_tpu.models import load_model
from vptq_tpu.layers.runtime import _exact_weight
from vptq_tpu.tools.checkpoint_tools import (
    absorb_perm,
    load_raw_state,
    pack_checkpoint,
    save_state,
    unpack_checkpoint,
)
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)

VQ = dict(
    vector_len=4,
    num_centroids=64,
    num_res_centroids=16,
    enable_norm=True,
    enable_perm=True,
    is_indice_packed=True,
)


def _weights_of(path):
    model = load_model(str(path), dtype=jnp.float32)
    out = {}
    for i, block in enumerate(model.blocks):
        out[f"{i}.q"] = _exact_weight(block.attn.q_proj)
        out[f"{i}.down"] = _exact_weight(block.mlp.down_proj)
    return out


def test_absorb_perm_preserves_weights(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    write_synthetic_checkpoint(src, tiny_model_config(), vq_kwargs=VQ,
                               seed=21)
    before = _weights_of(src)

    state, config = load_raw_state(str(src))
    state, config = absorb_perm(state, config)
    save_state(state, config, str(dst))

    # perm gone from checkpoint + config
    assert not any(k.endswith(".perm") for k in state)
    for conf in config["quantization_config"][
        "config_for_layers"
    ].values():
        assert conf["enable_perm"] is False

    after = _weights_of(dst)
    for k in before:
        np.testing.assert_allclose(before[k], after[k], rtol=0, atol=0)


def test_pack_unpack_round_trip(tmp_path):
    src = tmp_path / "src"
    unpacked = tmp_path / "unpacked"
    repacked = tmp_path / "repacked"
    write_synthetic_checkpoint(src, tiny_model_config(), vq_kwargs=VQ,
                               seed=22)
    before = _weights_of(src)

    state, config = load_raw_state(str(src))
    state, config = unpack_checkpoint(state, config)
    save_state(state, config, str(unpacked))
    mid = _weights_of(unpacked)

    state, config = load_raw_state(str(unpacked))
    state, config = pack_checkpoint(state, config)
    save_state(state, config, str(repacked))
    after = _weights_of(repacked)

    for k in before:
        np.testing.assert_allclose(before[k], mid[k], rtol=0, atol=0)
        np.testing.assert_allclose(before[k], after[k], rtol=0, atol=0)


def test_pre_process_cli(tmp_path):
    from vptq_tpu.tools.pre_process import main

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    write_synthetic_checkpoint(src, tiny_model_config(), vq_kwargs=VQ,
                               seed=23)
    rc = main(["-m", str(src), "-o", str(dst)])
    assert rc == 0
    assert (dst / "model.safetensors").exists()
    before = _weights_of(src)
    after = _weights_of(dst)
    for k in before:
        np.testing.assert_allclose(before[k], after[k], rtol=0, atol=0)
