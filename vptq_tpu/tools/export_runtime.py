"""Export / import pre-encoded runtime checkpoints.

Loading a VPTQ checkpoint with ``runtime_format="int8"`` re-encodes
every layer (dequant + requant) — minutes of host work for 70B-class
models. This tool runs the re-encode once and saves the runtime
representation (int8 planes + scales, dense bf16 tensors) as
safetensors, so subsequent starts stream straight from disk.

CLI:
    python -m vptq_tpu.tools.export_runtime -m CKPT -o OUT \
        [--runtime-format int8]

Load:
    model = vptq_tpu.models.loader.load_runtime_model(OUT)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path
from typing import Dict

import numpy as np

__all__ = ["export_runtime", "load_runtime_model"]

_FORMAT_VERSION = 1


def _flatten_model(model) -> Dict[str, np.ndarray]:
    """Flatten the runtime pytree into named host tensors."""
    import jax

    from vptq_tpu.layers.dense import DenseLinear
    from vptq_tpu.layers.runtime import (
        Int2Linear,
        Int2MixedLinear,
        Int3Linear,
        Int3MixedLinear,
        Int4Linear,
        Int8Linear,
    )

    out: Dict[str, np.ndarray] = {}

    def put(name, x):
        if x is None:
            return
        # device_get can hand back a STRIDED host view (narrow last
        # dims on the tunneled TPU backend); the later same-size
        # dtype view + safetensors serialization both read the raw
        # buffer, silently scrambling non-contiguous arrays — force
        # contiguity here (caught by the on-chip int2-mixed
        # export/reload drive, round 5)
        a = np.ascontiguousarray(np.asarray(jax.device_get(x)))
        out[name] = a

    def put_linear(prefix, lin):
        if lin is None:
            return
        if isinstance(lin, Int3MixedLinear):
            put_linear(f"{prefix}.mix3", lin.int3)
            put_linear(f"{prefix}.mix8", lin.int8)
            put(f"{prefix}.mix_cols", lin.col_idx)
            put(f"{prefix}.bias", lin.bias)
            return
        if isinstance(lin, Int2MixedLinear):
            put_linear(f"{prefix}.mix2", lin.int2)
            put_linear(f"{prefix}.mix8", lin.int8)
            put(f"{prefix}.mix_cols", lin.col_idx)
            put(f"{prefix}.bias", lin.bias)
            return
        if isinstance(lin, Int8Linear):
            put(f"{prefix}.wq", lin.wq)
            put(f"{prefix}.scales", lin.scales)
            put(f"{prefix}.bias", lin.bias)
        elif isinstance(lin, Int4Linear):
            put(f"{prefix}.wq4", lin.wq)
            put(f"{prefix}.scales4", lin.scales)
            put(f"{prefix}.bias", lin.bias)
        elif isinstance(lin, Int3Linear):
            put(f"{prefix}.wq3_2", lin.wq2)
            put(f"{prefix}.wq3_1", lin.wq1)
            put(f"{prefix}.scales3", lin.scales)
            put(f"{prefix}.bias", lin.bias)
        elif isinstance(lin, Int2Linear):
            put(f"{prefix}.wq2p", lin.wq)
            put(f"{prefix}.scales2", lin.scales)
            put(f"{prefix}.bias", lin.bias)
        elif isinstance(lin, DenseLinear):
            put(f"{prefix}.weight", lin.weight)
            put(f"{prefix}.bias", lin.bias)
        else:
            raise ValueError(
                f"{prefix}: cannot export {type(lin).__name__}; "
                "use runtime_format int8/int4/bf16"
            )

    from vptq_tpu.models.llama import DeepseekMoe, MoeMlp

    put("embed_tokens", model.embed_tokens)
    put("norm", model.norm)
    put_linear("lm_head", model.lm_head)
    for i, block in enumerate(model.blocks):
        p = f"blocks.{i}"
        put(f"{p}.input_layernorm", block.input_layernorm)
        put(f"{p}.post_attention_layernorm",
            block.post_attention_layernorm)
        a = block.attn
        if hasattr(a, "kv_a_proj"):  # MLA
            put_linear(f"{p}.attn.kv_a_proj", a.kv_a_proj)
            put(f"{p}.attn.kv_a_norm", a.kv_a_norm)
            put_linear(f"{p}.attn.kv_b_proj", a.kv_b_proj)
            put_linear(f"{p}.attn.o_proj", a.o_proj)
            put_linear(f"{p}.attn.q_proj", a.q_proj)
            put_linear(f"{p}.attn.q_a_proj", a.q_a_proj)
            put(f"{p}.attn.q_a_norm", a.q_a_norm)
            put_linear(f"{p}.attn.q_b_proj", a.q_b_proj)
            put(f"{p}.attn.uk", a.uk)
            put(f"{p}.attn.uv", a.uv)
        else:
            for name in ("q_proj", "k_proj", "v_proj", "o_proj",
                         "qkv_proj"):
                put_linear(f"{p}.attn.{name}", getattr(a, name))
        m = block.mlp
        def put_stacked(prefix, st):
            """fuse_model drops per-expert copies once stacked exists
            (expert weights live once in HBM) — export the stacked
            arrays; fmt rides the key name."""
            put(f"{prefix}.stacked_{st.fmt}.gate_up_wq", st.gate_up_wq)
            put(f"{prefix}.stacked_{st.fmt}.gate_up_scales",
                st.gate_up_scales)
            put(f"{prefix}.stacked_{st.fmt}.down_wq", st.down_wq)
            put(f"{prefix}.stacked_{st.fmt}.down_scales",
                st.down_scales)

        if isinstance(m, DeepseekMoe):
            put(f"{p}.mlp.router_weight", m.router_weight)
            put(f"{p}.mlp.correction_bias", m.correction_bias)
            if m.stacked is not None and not m.experts:
                put_stacked(f"{p}.mlp", m.stacked)
            for e, ex in enumerate(m.experts):
                for name in ("gate_proj", "up_proj", "down_proj",
                             "gate_up_proj"):
                    put_linear(
                        f"{p}.mlp.experts.{e}.{name}",
                        getattr(ex, name),
                    )
            for name in ("gate_proj", "up_proj", "down_proj",
                         "gate_up_proj"):
                put_linear(
                    f"{p}.mlp.shared_experts.{name}",
                    getattr(m.shared_experts, name),
                )
        elif isinstance(m, MoeMlp):
            put_linear(f"{p}.mlp.router", m.router)
            if m.stacked is not None and not m.experts:
                put_stacked(f"{p}.mlp", m.stacked)
            for e, ex in enumerate(m.experts):
                for name in ("gate_proj", "up_proj", "down_proj",
                             "gate_up_proj"):
                    put_linear(
                        f"{p}.mlp.experts.{e}.{name}",
                        getattr(ex, name),
                    )
        else:
            for name in ("gate_proj", "up_proj", "down_proj",
                         "gate_up_proj"):
                put_linear(f"{p}.mlp.{name}", getattr(m, name))
    return out


def export_runtime(model, out_dir: str) -> Path:
    """Save a loaded (int8/bf16) model's runtime tensors to disk."""
    from safetensors.numpy import save_file

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    tensors = _flatten_model(model)
    # ml_dtypes bf16 arrays can't go through safetensors.numpy; view
    # as uint16 and record which keys to view back.
    bf16_keys = []
    import ml_dtypes

    for k, v in tensors.items():
        if v.dtype == ml_dtypes.bfloat16:
            tensors[k] = v.view(np.uint16)
            bf16_keys.append(k)
    save_file(tensors, out / "runtime.safetensors")
    meta = {
        "format_version": _FORMAT_VERSION,
        "model_config": dataclasses.asdict(model.cfg),
        "bf16_keys": bf16_keys,
    }
    with open(out / "runtime_config.json", "w") as f:
        json.dump(meta, f, indent=2)
    return out


def load_runtime_model(runtime_dir: str):
    """Load a model exported by :func:`export_runtime`."""
    import jax.numpy as jnp
    import ml_dtypes

    from vptq_tpu.layers.dense import DenseLinear
    from vptq_tpu.layers.runtime import (
        Int2Linear,
        Int2MixedLinear,
        Int3Linear,
        Int3MixedLinear,
        Int4Linear,
        Int8Linear,
    )
    from vptq_tpu.models.llama import (
        Attention,
        Block,
        DeepseekMoe,
        MlaAttention,
        Mlp,
        MoeMlp,
        Model,
        ModelConfig,
    )
    from vptq_tpu.models.loader import _read_safetensors

    root = Path(runtime_dir)
    with open(root / "runtime_config.json") as f:
        meta = json.load(f)
    if meta["format_version"] != _FORMAT_VERSION:
        raise ValueError(
            f"runtime format {meta['format_version']} unsupported"
        )
    mc_dict = dict(meta["model_config"])
    if mc_dict.get("rope_scaling"):
        mc_dict["rope_scaling"] = tuple(
            (k, v) for k, v in mc_dict["rope_scaling"]
        )
    cfg = ModelConfig(**mc_dict)

    raw = _read_safetensors(root / "runtime.safetensors")
    for k in meta["bf16_keys"]:
        raw[k] = raw[k].view(ml_dtypes.bfloat16)
    state = {k: jnp.asarray(v) for k, v in raw.items()}

    def get_linear(prefix):
        if f"{prefix}.mix_cols" in state:
            if f"{prefix}.mix2.wq2p" in state:
                return Int2MixedLinear(
                    int2=get_linear(f"{prefix}.mix2"),
                    int8=get_linear(f"{prefix}.mix8"),
                    col_idx=state[f"{prefix}.mix_cols"],
                    bias=state.get(f"{prefix}.bias"),
                )
            return Int3MixedLinear(
                int3=get_linear(f"{prefix}.mix3"),
                int8=get_linear(f"{prefix}.mix8"),
                col_idx=state[f"{prefix}.mix_cols"],
                bias=state.get(f"{prefix}.bias"),
            )
        if f"{prefix}.wq" in state:
            return Int8Linear(
                wq=state[f"{prefix}.wq"],
                scales=state[f"{prefix}.scales"],
                bias=state.get(f"{prefix}.bias"),
            )
        if f"{prefix}.wq4" in state:
            return Int4Linear(
                wq=state[f"{prefix}.wq4"],
                scales=state[f"{prefix}.scales4"],
                bias=state.get(f"{prefix}.bias"),
            )
        if f"{prefix}.wq3_2" in state:
            return Int3Linear(
                wq2=state[f"{prefix}.wq3_2"],
                wq1=state[f"{prefix}.wq3_1"],
                scales=state[f"{prefix}.scales3"],
                bias=state.get(f"{prefix}.bias"),
            )
        if f"{prefix}.wq2p" in state:
            return Int2Linear(
                wq=state[f"{prefix}.wq2p"],
                scales=state[f"{prefix}.scales2"],
                bias=state.get(f"{prefix}.bias"),
            )
        if f"{prefix}.weight" in state:
            return DenseLinear(
                weight=state[f"{prefix}.weight"],
                bias=state.get(f"{prefix}.bias"),
            )
        return None

    def get_stacked(p):
        from vptq_tpu.models.llama import StackedExperts

        for fmt in ("int8", "int4"):
            key = f"{p}.stacked_{fmt}.gate_up_wq"
            if key in state:
                return StackedExperts(
                    gate_up_wq=state[key],
                    gate_up_scales=state[
                        f"{p}.stacked_{fmt}.gate_up_scales"
                    ],
                    down_wq=state[f"{p}.stacked_{fmt}.down_wq"],
                    down_scales=state[
                        f"{p}.stacked_{fmt}.down_scales"
                    ],
                    fmt=fmt,
                )
        return None

    def get_mlp(p):
        if f"{p}.router_weight" in state:  # deepseek moe
            experts = []
            e = 0
            while get_linear(f"{p}.experts.{e}.down_proj") is not None:
                experts.append(_mk_mlp(f"{p}.experts.{e}"))
                e += 1
            return DeepseekMoe(
                router_weight=state[f"{p}.router_weight"],
                correction_bias=state[f"{p}.correction_bias"],
                experts=tuple(experts),
                shared_experts=_mk_mlp(f"{p}.shared_experts"),
                top_k=cfg.num_experts_per_tok,
                n_group=cfg.n_group,
                topk_group=cfg.topk_group,
                norm_topk_prob=cfg.norm_topk_prob,
                routed_scaling_factor=cfg.routed_scaling_factor,
                stacked=get_stacked(p),
            )
        if get_linear(f"{p}.router") is not None:  # mixtral moe
            experts = []
            e = 0
            while get_linear(f"{p}.experts.{e}.down_proj") is not None:
                experts.append(_mk_mlp(f"{p}.experts.{e}"))
                e += 1
            return MoeMlp(
                router=get_linear(f"{p}.router"),
                experts=tuple(experts),
                num_experts_per_tok=cfg.num_experts_per_tok,
                stacked=get_stacked(p),
            )
        return _mk_mlp(p)

    def _mk_mlp(p):
        return Mlp(
            gate_proj=get_linear(f"{p}.gate_proj"),
            up_proj=get_linear(f"{p}.up_proj"),
            down_proj=get_linear(f"{p}.down_proj"),
            gate_up_proj=get_linear(f"{p}.gate_up_proj"),
        )

    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"blocks.{i}"
        if f"{p}.attn.kv_a_norm" in state:
            attn = MlaAttention(
                kv_a_proj=get_linear(f"{p}.attn.kv_a_proj"),
                kv_a_norm=state[f"{p}.attn.kv_a_norm"],
                kv_b_proj=get_linear(f"{p}.attn.kv_b_proj"),
                o_proj=get_linear(f"{p}.attn.o_proj"),
                q_proj=get_linear(f"{p}.attn.q_proj"),
                q_a_proj=get_linear(f"{p}.attn.q_a_proj"),
                q_a_norm=state.get(f"{p}.attn.q_a_norm"),
                q_b_proj=get_linear(f"{p}.attn.q_b_proj"),
                uk=state.get(f"{p}.attn.uk"),
                uv=state.get(f"{p}.attn.uv"),
            )
        else:
            attn = Attention(
                q_proj=get_linear(f"{p}.attn.q_proj"),
                k_proj=get_linear(f"{p}.attn.k_proj"),
                v_proj=get_linear(f"{p}.attn.v_proj"),
                o_proj=get_linear(f"{p}.attn.o_proj"),
                qkv_proj=get_linear(f"{p}.attn.qkv_proj"),
            )
        blocks.append(
            Block(
                input_layernorm=state[f"{p}.input_layernorm"],
                attn=attn,
                post_attention_layernorm=state[
                    f"{p}.post_attention_layernorm"
                ],
                mlp=get_mlp(f"{p}.mlp"),
            )
        )
    return Model(
        embed_tokens=state["embed_tokens"],
        blocks=tuple(blocks),
        norm=state["norm"],
        lm_head=get_linear("lm_head"),
        cfg=cfg,
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--runtime-format", default="int8",
                   choices=("int8", "int4", "bf16"))
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from vptq_tpu.models import load_model

    model = load_model(
        args.model, dtype=jnp.bfloat16,
        runtime_format=args.runtime_format,
    )
    out = export_runtime(model, args.output)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
