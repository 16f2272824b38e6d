"""HF checkpoint ingestion: VPTQ safetensors → runtime pytrees.

Counterpart of the reference loader (reference:
vptq/layers/model_base.py:93-199), redesigned for TPU: instead of
meta-device module surgery + accelerate device hooks, we read the
safetensors shards on the host, *normalize* every quantized tensor into
the TPU-native layout, and assemble a functional :class:`Model` pytree.
Device placement is GSPMD's job (see ``vptq_tpu.parallel``), not the
loader's.

Normalization performed here (all host-side, one-time):
  * undo the uint16-viewed-as-float16/int16 dtype trick
    (reference vqlinear.py:110-113),
  * unpack v1 bit-packed int32 index streams into separate uint16/uint8
    planes (the v2-kernel layout, csrc/quant_gemv_v2.cu:28-33),
  * pre-invert the input permutation (argsort done once, not per call
    as in reference quant_gemm.py:208-211).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from vptq_tpu.config import QuantizationConfig, VQLinearConfig
from vptq_tpu.layers.dense import DenseLinear
from vptq_tpu.layers.vqlinear import VQLinear
from vptq_tpu.models.llama import (
    Attention,
    Block,
    MlaAttention,
    Mlp,
    Model,
    ModelConfig,
)
from vptq_tpu.ops.packing import index_plane_dtype

logger = logging.getLogger("vptq_tpu")

__all__ = ["load_model", "load_state_dict", "normalize_vq_layer"]


def _to_numpy_intview(x: np.ndarray) -> np.ndarray:
    """uint16-payload tensor (stored as f16/i16/u16) → numpy uint16."""
    if x.dtype in (np.float16, np.int16, np.uint16):
        return x.view(np.uint16)
    if x.dtype in (np.int64, np.int32):
        return x.astype(np.uint16)
    raise ValueError(f"unexpected stored index dtype {x.dtype}")


_SAFETENSORS_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "U16": np.uint16,
    "U32": np.uint32,
    "BOOL": np.bool_,
}


def _read_safetensors(path: Path) -> Dict[str, np.ndarray]:
    """Raw host-side safetensors reader (zero device involvement).

    The safetensors python loaders either reject bf16 (numpy) or place
    tensors on the default device (flax) — through this environment's
    TPU tunnel that means ~15 MB/s per direction. Ingestion is pure
    host work, so read the format directly: 8-byte header length +
    JSON header + flat buffer; bf16 via ml_dtypes.
    """
    import ml_dtypes

    dtypes = dict(_SAFETENSORS_DTYPES)
    dtypes["BF16"] = ml_dtypes.bfloat16
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n))
        base = 8 + n
        data = np.memmap(path, dtype=np.uint8, mode="r", offset=base)
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            start, end = meta["data_offsets"]
            arr = np.frombuffer(
                data[start:end], dtype=dtypes[meta["dtype"]]
            ).reshape(meta["shape"])
            out[name] = arr
    return out


def load_state_dict(checkpoint_dir: str) -> Dict[str, np.ndarray]:
    """Read all checkpoint shards as host numpy arrays.

    Safetensors first (with ``*.index.json`` shard maps); falls back
    to legacy torch ``pytorch_model*.bin`` pickles — parity with the
    reference loader, which handles both (model_base.py:146-163).
    """
    root = Path(checkpoint_dir)
    index_files = sorted(root.glob("*.safetensors.index.json"))
    if index_files:
        with open(index_files[0]) as f:
            weight_map = json.load(f)["weight_map"]
        shards = sorted({root / v for v in weight_map.values()})
    else:
        shards = sorted(root.glob("*.safetensors"))
    if not shards:
        return _load_torch_bins(root)

    state: Dict[str, np.ndarray] = {}
    for shard in shards:
        state.update(_read_safetensors(shard))
    return state


def _load_torch_bins(root: Path) -> Dict[str, np.ndarray]:
    """Legacy ``pytorch_model.bin`` (+ ``.bin.index.json``) reader."""
    index_files = sorted(root.glob("*.bin.index.json"))
    if index_files:
        with open(index_files[0]) as f:
            weight_map = json.load(f)["weight_map"]
        shards = sorted({root / v for v in weight_map.values()})
    else:
        shards = sorted(root.glob("pytorch_model*.bin"))
    if not shards:
        raise FileNotFoundError(
            f"no safetensors or pytorch_model*.bin found in {root}"
        )
    import torch

    state: Dict[str, np.ndarray] = {}
    for shard in shards:
        sd = torch.load(
            shard, map_location="cpu", weights_only=True
        )
        for k, v in sd.items():
            if v.dtype == torch.bfloat16:
                state[k] = v.view(torch.uint16).numpy()
                # preserved as raw uint16 bits; loader dtype handling
                # views them back (same trick as safetensors bf16)
                import ml_dtypes

                state[k] = state[k].view(ml_dtypes.bfloat16)
            else:
                state[k] = v.numpy()
    return state


def normalize_vq_layer(
    prefix: str,
    state: Dict[str, jnp.ndarray],
    cfg: VQLinearConfig,
    dtype=jnp.bfloat16,
) -> VQLinear:
    """Build one :class:`VQLinear` from checkpoint tensors.

    ``prefix`` is the module path, e.g.
    ``model.layers.0.self_attn.q_proj``. Tensor names follow the
    reference module's state dict (vqlinear.py:107-240): the codebooks
    are nn.Embedding weights (``centroids.weight``), indices/perm are
    raw Parameters.
    """

    def pop(name: str) -> Optional[jnp.ndarray]:
        return state.pop(f"{prefix}.{name}", None)

    centroids = pop("centroids.weight")
    if centroids is None:
        raise KeyError(f"{prefix}: missing centroids.weight")
    c, k, v = cfg.num_codebooks, cfg.num_main_centroids, cfg.vector_len
    centroids = np.asarray(centroids).reshape(c, k, v).astype(dtype)

    indices_raw = pop("indices")
    res_ids = None
    if cfg.is_indice_packed:
        packed = np.asarray(indices_raw)
        if packed.dtype != np.int32:
            packed = packed.view(np.int32)
        packed = packed.reshape(c, cfg.num_indices, cfg.packed_group_size)
        from vptq_tpu import native

        main_u16, res_u16 = native.unpack_indices(
            packed, cfg.index_bits, cfg.group_size, cfg.res_index_bits
        )
        ids = main_u16.astype(index_plane_dtype(k))
        if res_u16 is not None:
            res_ids = res_u16.astype(
                index_plane_dtype(cfg.num_main_res_centroids)
            )
    else:
        main = _to_numpy_intview(indices_raw).reshape(
            c, cfg.num_indices, cfg.group_size
        )
        ids = main.astype(index_plane_dtype(k))
        res_raw = pop("res_indices")
        if res_raw is not None:
            res = _to_numpy_intview(res_raw).reshape(
                c, cfg.num_indices, cfg.group_size
            )
            res_ids = res.astype(
                index_plane_dtype(cfg.num_main_res_centroids)
            )

    res_centroids = pop("res_centroids.weight")
    if res_centroids is not None:
        res_centroids = np.asarray(res_centroids).reshape(
            c, cfg.num_main_res_centroids, v
        ).astype(dtype)

    outlier_centroids = pop("outlier_centroids.weight")
    outlier_ids = None
    if outlier_centroids is not None:
        outlier_centroids = np.asarray(outlier_centroids).reshape(
            1, cfg.num_outlier_centroids, cfg.outlier_vector_len
        ).astype(dtype)
        outlier_raw = pop("outlier_indices")
        outlier = _to_numpy_intview(outlier_raw).reshape(
            1, cfg.outlier_num_indices, cfg.outlier_size
        )
        outlier_ids = outlier.astype(
            index_plane_dtype(cfg.num_outlier_centroids)
        )

    perm_raw = pop("perm")
    inv_perm = None
    if perm_raw is not None and cfg.enable_perm:
        perm = _to_numpy_intview(perm_raw).astype(np.int64)
        inv_perm = np.argsort(perm).astype(np.int32)

    weight_scale = pop("weight_scale")
    weight_bias = pop("weight_bias")
    bias = pop("bias")

    return VQLinear(
        centroids=centroids,
        ids=ids,
        res_centroids=res_centroids,
        res_ids=res_ids,
        outlier_centroids=outlier_centroids,
        outlier_ids=outlier_ids,
        inv_perm=inv_perm,
        weight_scale=None
        if weight_scale is None
        else weight_scale.astype(dtype),
        weight_bias=None
        if weight_bias is None
        else weight_bias.astype(dtype),
        bias=None if bias is None else bias.astype(dtype),
        cfg=cfg,
    )


def _linear(
    prefix: str,
    state: Dict[str, jnp.ndarray],
    qcfg: QuantizationConfig,
    dtype,
) -> DenseLinear | VQLinear:
    layer_cfg = qcfg.lookup(prefix)
    if layer_cfg is not None:
        return normalize_vq_layer(prefix, state, layer_cfg, dtype)
    weight = state.pop(f"{prefix}.weight")
    bias = state.pop(f"{prefix}.bias", None)
    return DenseLinear(
        weight=weight.astype(dtype),
        bias=None if bias is None else bias.astype(dtype),
    )


def load_model(
    checkpoint_dir: str,
    dtype=jnp.bfloat16,
    runtime_format: str = "codebook",
    fuse: bool = True,
    quantize_lm_head: bool = False,
    mesh=None,
    parallel: str = "auto",
    hbm_gb: Optional[float] = None,
    hbm_utilization: float = 0.9,
    calibration=None,
    int8_fraction: Optional[float] = None,
) -> Model:
    """Load a VPTQ HF checkpoint directory into a :class:`Model`.

    ``parallel`` (with ``mesh``): "tp" places Megatron shard_map
    tensor parallelism (parallel/tp.py — the TPU pallas-kernel path;
    row-parallel layers are encoded blocked, straight from the exact
    weights, and the model must be driven through
    ``parallel.tp.forward_tp`` / ``Generator(mesh=...)``); "gspmd"
    annotates GSPMD sharding specs (parallel/sharding.py — for the
    XLA/codebook paths). "auto" (default) picks tp for the runtime
    formats and gspmd for codebook.

    ``runtime_format``: "codebook" keeps compressed VQ layers (exact,
    minimal memory, slow matmul); "int8" / "bf16" re-encode each layer
    once into the dense TPU runtime format (see
    vptq_tpu/layers/runtime.py). ``fuse`` merges q|k|v and gate|up
    projections into single matmuls (dense formats only).
    ``quantize_lm_head`` additionally re-encodes the (normally dense
    bf16) lm_head to int8 — ~0.3% logit noise for half its HBM
    traffic per decode step.

    ``mesh``: a ``jax.sharding.Mesh`` for **sharded ingestion** — each
    decoder block is re-encoded on the host and ``device_put`` directly
    onto the mesh with its TP/EP PartitionSpec (parallel/sharding.py),
    block by block. The model never exists whole on one chip (or as a
    single host copy beyond the memory-mapped checkpoint), which is
    what makes 70B-class models loadable on small-HBM chips — the
    capability the reference gets from accelerate's per-layer dispatch
    (reference model_base.py:186-194).

    ``hbm_gb``/``hbm_utilization``: per-chip HBM budget. The loader
    predicts the runtime footprint from config geometry BEFORE reading
    any weights, logs the fmt × chips budget table, and raises
    :class:`~vptq_tpu.utils.memory.HBMBudgetError` with a suggestion
    when the requested placement cannot fit (parity with the
    reference's ``gpu_utilization`` cap, model_base.py:165-181).
    ``hbm_gb=None`` auto-detects from PJRT ``memory_stats`` and skips
    the check when the backend exposes none (CPU meshes).

    ``runtime_format="int4-mixed"`` / ``calibration``: calibrated
    re-encode (vptq_tpu.quant) — the model is first loaded exact
    (codebook), then GPTQ error-feedback quantized against
    calibration activations; "int4-mixed" additionally keeps the
    measured-most-sensitive ``int8_fraction`` of sites in int8.
    ``calibration`` is a (B, S) int32 token array, an int (number of
    synthetic calibration tokens), or None (default 4096 synthetic
    tokens for the calibrated formats). With ``mesh`` +
    ``parallel="tp"`` the calibrated model is Megatron-placed:
    row-parallel sites are encoded blocked with PER-SHARD GPTQ, so
    the calibrated quality survives TP placement.
    """
    calibrated = runtime_format in (
        "int4-mixed", "int3-mixed", "int2-mixed"
    ) or (
        calibration is not None
        and runtime_format in ("int2", "int3", "int4", "int8")
    )
    if calibrated:
        tp_mesh = None
        if mesh is not None:
            if parallel == "gspmd":
                raise NotImplementedError(
                    "calibrated formats under GSPMD: calibrate with "
                    "mesh=None, then place with sharding.shard_block"
                )
            # shard_map TP: calibrate single-host with row-parallel
            # sites encoded BLOCKED (per-shard GPTQ), then place
            # (tp_place_model validates cfg x TP-size divisibility)
            tp_mesh = mesh
        from vptq_tpu.quant.calibrate import (
            quantize_model_calibrated,
            synthetic_calibration_tokens,
        )

        exact = load_model(
            checkpoint_dir,
            dtype=dtype,
            runtime_format="codebook",
            fuse=False,
            hbm_gb=hbm_gb,
            hbm_utilization=hbm_utilization,
        )
        tokens = calibration
        if isinstance(tokens, (int, np.integer)):
            tokens = synthetic_calibration_tokens(
                exact.cfg.vocab_size, n_tokens=int(tokens)
            )
        model, _report = quantize_model_calibrated(
            exact,
            tokens,
            fmt=runtime_format,
            int8_fraction=int8_fraction,
            fuse=fuse,
            tp_shards=(
                int(tp_mesh.shape["model"]) if tp_mesh is not None else 1
            ),
            upload=tp_mesh is None,
        )
        # quantize_model_calibrated only re-encodes decoder blocks: a
        # checkpoint whose lm_head is itself VPTQ-quantized would keep
        # a VQLinear vocab projection (the measured-slow gather path)
        # unless converted here, mirroring the non-calibrated path.
        lm = model.lm_head
        if isinstance(lm, VQLinear):
            from vptq_tpu.layers.runtime import to_runtime

            base_fmt = {
                "int4-mixed": "int4", "int3-mixed": "int3",
                "int2-mixed": "int2",
            }.get(runtime_format, runtime_format)
            lm = to_runtime(lm, base_fmt)
        if quantize_lm_head and isinstance(lm, DenseLinear):
            from vptq_tpu.layers.runtime import dense_to_int8

            lm = dense_to_int8(lm)
        if lm is not model.lm_head:
            import jax

            if tp_mesh is None:
                lm = jax.tree.map(jnp.asarray, lm)
            model = Model(
                embed_tokens=model.embed_tokens,
                blocks=model.blocks,
                norm=model.norm,
                lm_head=lm,
                cfg=model.cfg,
            )
        if tp_mesh is not None:
            from vptq_tpu.parallel.tp import tp_place_model

            model, _specs = tp_place_model(
                model, tp_mesh, reencode_rows=False
            )
        return model

    root = Path(checkpoint_dir)
    if not root.exists():
        # Hub reference (reference model_base.py:139-163): download the
        # snapshot. Requires network access; community checkpoints are
        # safetensors-only so *.bin is skipped.
        import os

        import huggingface_hub

        token = os.environ.get("HF_TOKEN")
        root = Path(
            huggingface_hub.snapshot_download(
                repo_id=checkpoint_dir,
                ignore_patterns=["*.bin"],
                token=token,
            )
        )
    with open(root / "config.json") as f:
        hf_config = json.load(f)

    model_cfg = ModelConfig.from_hf_dict(hf_config)
    qcfg = QuantizationConfig.from_dict(
        hf_config.get("quantization_config", {})
    )

    if parallel == "auto":
        # the shard_map Megatron path is the TPU kernel path; the
        # codebook format's XLA gathers partition natively under
        # GSPMD (and tp does not support it)
        parallel = "gspmd" if runtime_format == "codebook" else "tp"
    if mesh is not None and parallel not in ("gspmd", "tp"):
        raise ValueError(
            f"parallel must be 'auto'/'gspmd'/'tp', not {parallel!r}"
        )
    tp_mode = mesh is not None and parallel == "tp"
    if tp_mode:
        from vptq_tpu.parallel.tp import tp_validate

        tp_size = int(mesh.shape["model"])
        tp_validate(
            model_cfg, tp_size,
            sharded_lm_head=not model_cfg.tie_word_embeddings,
        )
    else:
        tp_size = 1

    # --- HBM budget check: fail BEFORE reading any weights ----------
    from vptq_tpu.utils import memory as hbm

    # weights shard only over the MODEL axis (the data axis carries
    # batch/sequence with weights replicated) — dividing by all
    # devices would let a DP x TP mesh pass the check and then OOM
    n_devices = (
        int(mesh.shape["model"]) if mesh is not None else 1
    )
    hbm_bytes = (
        int(hbm_gb * hbm.GiB) if hbm_gb else hbm.detect_hbm_bytes()
    )
    est = hbm.estimate_model_bytes(
        model_cfg, runtime_format, qcfg, quantize_lm_head,
        tp_shards=tp_size,
    )
    if hbm_bytes:
        table = hbm.budget_table(
            model_cfg, qcfg, hbm_bytes=hbm_bytes,
            utilization=hbm_utilization,
        )
        logger.info(
            "HBM budget (per-chip, weights + 2048-token KV):\n%s",
            hbm.format_budget_table(table),
        )
        hbm.check_budget(
            est["total"] + hbm.kv_cache_bytes(model_cfg, 1, 2048),
            n_devices,
            hbm_bytes,
            hbm_utilization,
            what=f"{runtime_format} model ({est['total'] / hbm.GiB:.2f}"
            " GiB weights)",
        )

    state = load_state_dict(str(root))

    from vptq_tpu.layers.runtime import to_runtime

    def lin(prefix, row: bool = False):
        return to_runtime(
            _linear(prefix, state, qcfg, dtype),
            runtime_format,
            row_shards=tp_size if (row and tp_mode) else 1,
        )

    # phi3-style checkpoints store qkv and gate|up already fused
    # (tensor names qkv_proj / gate_up_proj); our Attention/Mlp
    # represent fused projections natively.
    fused_ckpt = model_cfg.model_type in ("phi3", "phi3_v", "phimoe")
    moe = model_cfg.num_local_experts > 0
    deepseek = model_cfg.is_mla

    def dense_mlp(p, row=False):
        # row=True for TP row-parallel placement (dense-replace and
        # shared-expert mlps); routed experts stay whole per device
        return Mlp(
            gate_proj=lin(f"{p}.gate_proj"),
            up_proj=lin(f"{p}.up_proj"),
            down_proj=lin(f"{p}.down_proj", row=row),
        )

    def mla_attention(p):
        if model_cfg.q_lora_rank:
            q_kwargs = dict(
                q_a_proj=lin(f"{p}.q_a_proj"),
                q_a_norm=jnp.asarray(
                    np.asarray(
                        state.pop(f"{p}.q_a_layernorm.weight")
                    ).astype(np.float32)
                ),
                q_b_proj=lin(f"{p}.q_b_proj"),
            )
        else:
            q_kwargs = dict(q_proj=lin(f"{p}.q_proj"))
        from vptq_tpu.layers.runtime import absorb_mla

        attn = MlaAttention(
            kv_a_proj=lin(f"{p}.kv_a_proj_with_mqa"),
            kv_a_norm=jnp.asarray(
                np.asarray(
                    state.pop(f"{p}.kv_a_layernorm.weight")
                ).astype(np.float32)
            ),
            # raw (unconverted) layer: absorb_mla dequantizes it
            # exactly into bf16 uk/uv — converting to int8/int4 first
            # would bake avoidable re-encode noise into the absorbed
            # matrices and waste the quantization pass
            kv_b_proj=_linear(f"{p}.kv_b_proj", state, qcfg, dtype),
            o_proj=lin(f"{p}.o_proj", row=True),
            **q_kwargs,
        )
        # latent-space attention: absorb kv_b into uk/uv and drop it
        return absorb_mla(attn, model_cfg, dtype)

    def deepseek_moe(p, layer_idx):
        from vptq_tpu.models.llama import DeepseekMoe

        if layer_idx < model_cfg.first_k_dense_replace:
            return dense_mlp(f"{p}.mlp", row=True)
        experts = tuple(
            dense_mlp(f"{p}.mlp.experts.{e}")
            for e in range(model_cfg.n_routed_experts)
        )
        return DeepseekMoe(
            router_weight=jnp.asarray(
                np.asarray(
                    state.pop(f"{p}.mlp.gate.weight")
                ).astype(np.float32)
            ),
            correction_bias=jnp.asarray(
                np.asarray(
                    state.pop(
                        f"{p}.mlp.gate.e_score_correction_bias"
                    )
                ).astype(np.float32)
            ),
            experts=experts,
            shared_experts=dense_mlp(
                f"{p}.mlp.shared_experts", row=True
            ),
            top_k=model_cfg.num_experts_per_tok,
            n_group=model_cfg.n_group,
            topk_group=model_cfg.topk_group,
            norm_topk_prob=model_cfg.norm_topk_prob,
            routed_scaling_factor=model_cfg.routed_scaling_factor,
        )

    def moe_mlp(p):
        # mixtral layout: block_sparse_moe.gate + experts.E.w1/w2/w3
        # (w1=gate, w2=down, w3=up)
        from vptq_tpu.models.llama import MoeMlp

        experts = []
        for e in range(model_cfg.num_local_experts):
            ep = f"{p}.block_sparse_moe.experts.{e}"
            experts.append(
                Mlp(
                    gate_proj=lin(f"{ep}.w1"),
                    up_proj=lin(f"{ep}.w3"),
                    down_proj=lin(f"{ep}.w2"),
                )
            )
        return MoeMlp(
            router=lin(f"{p}.block_sparse_moe.gate"),
            experts=tuple(experts),
            num_experts_per_tok=model_cfg.num_experts_per_tok,
        )

    do_fuse = fuse and runtime_format != "codebook"
    if do_fuse or mesh is not None:
        from vptq_tpu.layers.runtime import fuse_block
    if mesh is not None:
        from vptq_tpu.parallel.sharding import (
            replicated as _replicated,
            shard_block,
            shard_linear,
        )
    if tp_mode:
        from vptq_tpu.parallel.tp import (
            _col_parallel as _tp_col,
            tp_place_block,
        )

    blocks = []
    for i in range(model_cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        if deepseek:
            attn = mla_attention(f"{p}.self_attn")
            mlp = deepseek_moe(p, i)
        elif fused_ckpt:
            attn = Attention(
                q_proj=None, k_proj=None, v_proj=None,
                o_proj=lin(f"{p}.self_attn.o_proj", row=True),
                qkv_proj=lin(f"{p}.self_attn.qkv_proj"),
            )
            mlp = Mlp(
                gate_proj=None, up_proj=None,
                down_proj=lin(f"{p}.mlp.down_proj", row=True),
                gate_up_proj=lin(f"{p}.mlp.gate_up_proj"),
            )
        else:
            attn = Attention(
                q_proj=lin(f"{p}.self_attn.q_proj"),
                k_proj=lin(f"{p}.self_attn.k_proj"),
                v_proj=lin(f"{p}.self_attn.v_proj"),
                o_proj=lin(f"{p}.self_attn.o_proj", row=True),
            )
            if moe:
                mlp = moe_mlp(p)
            else:
                mlp = Mlp(
                    gate_proj=lin(f"{p}.mlp.gate_proj"),
                    up_proj=lin(f"{p}.mlp.up_proj"),
                    down_proj=lin(f"{p}.mlp.down_proj", row=True),
                )
        block = Block(
            input_layernorm=state.pop(
                f"{p}.input_layernorm.weight"
            ).astype(jnp.float32),
            attn=attn,
            post_attention_layernorm=state.pop(
                f"{p}.post_attention_layernorm.weight"
            ).astype(jnp.float32),
            mlp=mlp,
        )
        if do_fuse:
            block = fuse_block(block)
        if tp_mode:
            # sharded ingestion, shard_map placement: row-parallel
            # layers arrive pre-blocked from lin(row=True); this
            # permutes fused projections and device_puts the block
            block, _ = tp_place_block(
                block, mesh, "model", model_cfg,
                reencode_rows=False,
            )
        elif mesh is not None:
            # sharded ingestion: this block's host arrays are
            # device_put onto the mesh NOW and freed on the host —
            # peak host/chip memory is one block, not the model
            block = shard_block(block, mesh)
        blocks.append(block)

    embed = state.pop("model.embed_tokens.weight").astype(dtype)
    norm = state.pop("model.norm.weight").astype(jnp.float32)

    lm_head = None
    if not model_cfg.tie_word_embeddings:
        if "lm_head.weight" in state or qcfg.lookup("lm_head") is not None:
            lm_head = lin("lm_head")
    if quantize_lm_head and isinstance(lm_head, DenseLinear):
        from vptq_tpu.layers.runtime import dense_to_int8

        lm_head = dense_to_int8(lm_head)

    leftover = [k for k in state if "rotary" not in k]
    if leftover:
        logger.warning("unused checkpoint tensors: %s", leftover[:8])

    if mesh is not None:
        if tp_mode and lm_head is not None:
            # untied: vocab-sharded embedding (forward does a
            # local-range lookup + psum under shard_map TP)
            from jax.sharding import NamedSharding, PartitionSpec

            import jax

            embed = jax.device_put(
                embed,
                NamedSharding(mesh, PartitionSpec("model", None)),
            )
        else:
            embed = _replicated(embed, mesh)
        norm = _replicated(norm, mesh)
        if lm_head is not None:
            if tp_mode:
                lm_head, _ = _tp_col(lm_head, mesh, "model")
            else:
                lm_head = shard_linear(lm_head, mesh, True)
        return Model(
            embed_tokens=embed,
            blocks=tuple(blocks),
            norm=norm,
            lm_head=lm_head,
            cfg=model_cfg,
        )

    model = Model(
        embed_tokens=embed,
        blocks=tuple(blocks),
        norm=norm,
        lm_head=lm_head,
        cfg=model_cfg,
    )
    # single host->device upload of the final runtime representation
    # (ingestion above is all-numpy on purpose)
    import jax

    model = jax.tree.map(jnp.asarray, model)
    return model
