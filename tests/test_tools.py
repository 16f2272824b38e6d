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


def test_wrapper_prefix_checkpoints(tmp_path):
    """SentenceTransformer-style nesting: tensors live under
    ``0.auto_model.<name>`` while config_for_layers uses bare names
    (reference pack_model navigates model[0].auto_model,
    reference pack.py:269-281). Transforms must resolve the prefix."""
    from vptq_tpu.tools.checkpoint_tools import resolve_layer_prefix

    src = tmp_path / "src"
    write_synthetic_checkpoint(src, tiny_model_config(), vq_kwargs=VQ,
                               seed=33)
    state, config = load_raw_state(str(src))
    plain_state = dict(state)

    wrapped = {f"0.auto_model.{k}": v for k, v in state.items()}
    assert resolve_layer_prefix(wrapped, config) == "0.auto_model."

    # absorb_perm on wrapped == absorb_perm on plain, modulo prefix
    w_state, w_config = absorb_perm(dict(wrapped), dict(config))
    state2, config2 = load_raw_state(str(src))
    p_state, p_config = absorb_perm(state2, config2)
    assert set(w_state) == {f"0.auto_model.{k}" for k in p_state}
    for k, v in p_state.items():
        np.testing.assert_array_equal(w_state[f"0.auto_model.{k}"], v)

    # unpack -> pack round-trip under the prefix
    state3, config3 = unpack_checkpoint(
        dict(wrapped), dict(config)
    )
    state4, config4 = pack_checkpoint(state3, config3)
    for k, v in plain_state.items():
        np.testing.assert_array_equal(
            state4[f"0.auto_model.{k}"], v
        )


def test_legacy_pytorch_bin_checkpoint(tmp_path):
    """Loader parity with the reference's legacy *.bin read path
    (reference model_base.py:146-163)."""
    import shutil

    import torch

    from vptq_tpu.models.llama import forward, init_cache

    src = tmp_path / "st"
    write_synthetic_checkpoint(src, tiny_model_config(), vq_kwargs=VQ,
                               seed=63)
    ref_model = load_model(str(src), dtype=jnp.float32)

    # convert to a legacy bin checkpoint
    state, config = load_raw_state(str(src))
    dst = tmp_path / "bin"
    dst.mkdir()
    shutil.copy(src / "config.json", dst / "config.json")
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in state.items()},
        dst / "pytorch_model.bin",
    )
    bin_model = load_model(str(dst), dtype=jnp.float32)

    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    la, _ = forward(ref_model, tokens, init_cache(ref_model.cfg, 1, 8,
                                                  jnp.float32),
                    dtype=jnp.float32)
    lb, _ = forward(bin_model, tokens, init_cache(bin_model.cfg, 1, 8,
                                                  jnp.float32),
                    dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-6, atol=1e-6)
