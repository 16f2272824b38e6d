"""Offline checkpoint transformations (publisher tooling).

TPU counterparts of the reference's pack/repack pipeline
(reference: vptq/utils/pack.py and vptq/tools/pre_process.py):

  * ``absorb_perm``    — fold the input permutation into index order
    and disable ``enable_perm`` (reference pack.py:284-433).
  * ``pack_checkpoint``   — merge separate main/residual index planes
    into the bit-packed int32 stream (reference ``convert_idx_dtype``,
    pack.py:147-242).
  * ``unpack_checkpoint`` — inverse: packed stream → separate
    uint16-viewed planes (the v2-kernel format).

All transforms operate host-side on safetensors state dicts — no
device involvement, no torch.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict

import numpy as np

from vptq_tpu.config import QuantizationConfig, VQLinearConfig
from vptq_tpu.ops.packing import pack_index, unpack_index, view_as_uint16

logger = logging.getLogger("vptq_tpu")

__all__ = [
    "load_raw_state",
    "save_state",
    "absorb_perm",
    "pack_checkpoint",
    "unpack_checkpoint",
    "resolve_layer_prefix",
]


def resolve_layer_prefix(state, config) -> str:
    """Tensor-name prefix between state-dict keys and
    ``config_for_layers`` names.

    Wrapper checkpoints nest the transformer under an extra module
    path — e.g. SentenceTransformer stores it as ``0.auto_model.<name>``
    (the reference navigates ``model[0].auto_model`` in ``pack_model``,
    reference pack.py:269-281). Returns "" for plain checkpoints.
    """
    qcfg = QuantizationConfig.from_dict(
        config.get("quantization_config", {})
    )
    names = list(qcfg.config_for_layers)
    if not names:
        return ""
    probe = f"{names[0]}.indices"
    if probe in state:
        return ""
    for key in state:
        if key.endswith("." + probe):
            return key[: -len(probe)]
    raise KeyError(
        f"cannot locate {probe!r} in checkpoint state "
        "(unknown wrapper layout)"
    )


def load_raw_state(checkpoint_dir: str):
    """(state dict of numpy arrays, hf config dict)."""
    from safetensors import safe_open

    root = Path(checkpoint_dir)
    with open(root / "config.json") as f:
        config = json.load(f)

    index_files = sorted(root.glob("*.index.json"))
    if index_files:
        with open(index_files[0]) as f:
            weight_map = json.load(f)["weight_map"]
        shards = sorted({root / v for v in weight_map.values()})
    else:
        shards = sorted(root.glob("*.safetensors"))

    state: Dict[str, np.ndarray] = {}
    for shard in shards:
        with safe_open(shard, framework="numpy") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    return state, config


def save_state(state, config, out_dir: str) -> Path:
    from safetensors.numpy import save_file

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_file(dict(state), out / "model.safetensors")
    with open(out / "config.json", "w") as f:
        json.dump(config, f, indent=2)
    return out


def _iter_vq_layers(config):
    qcfg_dict = config.get("quantization_config", {})
    qcfg = QuantizationConfig.from_dict(qcfg_dict)
    for name, layer_cfg in qcfg.config_for_layers.items():
        yield name, layer_cfg


def absorb_perm(state, config):
    """Fold perms into index order; returns (state, config) modified.

    Matches reference semantics (pack.py:284-394): skips layers with
    more than one codebook; only valid when the index row covers the
    full in_features (no outlier component).
    """
    qc = config.get("quantization_config", {})
    layers = qc.get("config_for_layers", {})
    prefix = resolve_layer_prefix(state, config)
    n_absorbed = 0
    for name, layer_cfg in list(_iter_vq_layers(config)):
        if not layer_cfg.enable_perm:
            continue
        if layer_cfg.num_codebooks > 1:
            logger.debug("%s: group_num > 1, skipping absorption", name)
            continue
        if layer_cfg.enable_outlier:
            logger.debug("%s: outliers present, skipping absorption", name)
            continue

        perm_key = f"{prefix}{name}.perm"
        perm = view_as_uint16(state.pop(perm_key)).astype(np.int64)
        inv_perm = np.argsort(perm)

        idx_key = f"{prefix}{name}.indices"
        if layer_cfg.is_indice_packed:
            packed = state[idx_key].view(np.int32).reshape(
                layer_cfg.num_codebooks,
                layer_cfg.num_indices,
                layer_cfg.packed_group_size,
            )
            main, res = unpack_index(
                packed,
                layer_cfg.index_bits,
                layer_cfg.group_size,
                layer_cfg.res_index_bits,
            )
            main = main[..., inv_perm]
            if res is not None:
                res = res[..., inv_perm]
            repacked = pack_index(
                main,
                layer_cfg.index_bits,
                res,
                layer_cfg.res_index_bits,
            )
            if repacked.shape != packed.shape:
                raise ValueError(
                    f"{name}: repacked shape {repacked.shape} != "
                    f"{packed.shape}"
                )
            state[idx_key] = repacked.reshape(state[idx_key].shape)
        else:
            raw = state[idx_key]
            ids = view_as_uint16(raw).reshape(
                layer_cfg.num_codebooks,
                layer_cfg.num_indices,
                layer_cfg.group_size,
            )
            state[idx_key] = (
                ids[..., inv_perm].astype(np.uint16).view(raw.dtype)
            ).reshape(raw.shape)
            res_key = f"{prefix}{name}.res_indices"
            if res_key in state:
                raw = state[res_key]
                res = view_as_uint16(raw).reshape(
                    layer_cfg.num_codebooks,
                    layer_cfg.num_indices,
                    layer_cfg.group_size,
                )
                state[res_key] = (
                    res[..., inv_perm].astype(np.uint16).view(raw.dtype)
                ).reshape(raw.shape)

        layers[name]["enable_perm"] = False
        n_absorbed += 1
    # shared_layer_config parity (reference pack.py:425-431)
    for conf in qc.get("shared_layer_config", {}).values():
        if isinstance(conf, dict) and conf.get("enable_perm"):
            conf["enable_perm"] = False
    logger.info("absorbed perm in %d layers", n_absorbed)
    return state, config


def pack_checkpoint(state, config):
    """Separate uint16 planes → packed int32 stream per layer
    (publisher flow, reference convert_idx_dtype pack.py:147-242)."""
    qc = config.get("quantization_config", {})
    layers = qc.get("config_for_layers", {})
    prefix = resolve_layer_prefix(state, config)
    for name, layer_cfg in list(_iter_vq_layers(config)):
        if layer_cfg.is_indice_packed:
            continue
        idx_key = f"{prefix}{name}.indices"
        res_key = f"{prefix}{name}.res_indices"
        main = view_as_uint16(state[idx_key]).astype(np.int64).reshape(
            layer_cfg.num_codebooks,
            layer_cfg.num_indices,
            layer_cfg.group_size,
        )
        res = None
        if res_key in state:
            res = view_as_uint16(state.pop(res_key)).astype(
                np.int64
            ).reshape(main.shape)
        state[idx_key] = pack_index(
            main,
            layer_cfg.index_bits,
            res,
            layer_cfg.res_index_bits if res is not None else 0,
        )
        layers[name]["is_indice_packed"] = True
    return state, config


def unpack_checkpoint(state, config):
    """Packed int32 stream → separate uint16-viewed planes."""
    qc = config.get("quantization_config", {})
    layers = qc.get("config_for_layers", {})
    prefix = resolve_layer_prefix(state, config)
    for name, layer_cfg in list(_iter_vq_layers(config)):
        if not layer_cfg.is_indice_packed:
            continue
        idx_key = f"{prefix}{name}.indices"
        packed = state[idx_key].view(np.int32).reshape(
            layer_cfg.num_codebooks,
            layer_cfg.num_indices,
            layer_cfg.packed_group_size,
        )
        main, res = unpack_index(
            packed,
            layer_cfg.index_bits,
            layer_cfg.group_size,
            layer_cfg.res_index_bits,
        )
        state[idx_key] = main.astype(np.uint16).view(np.int16)
        if res is not None:
            state[f"{prefix}{name}.res_indices"] = res.astype(
                np.uint16
            ).view(np.int16)
        layers[name]["is_indice_packed"] = False
        layers[name]["indices_as_float"] = False
    return state, config
