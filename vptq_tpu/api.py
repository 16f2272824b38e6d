"""Convenience API mirroring the reference's entry point.

The reference exposes ``vptq.AutoModelForCausalLM.from_pretrained``
(reference: vptq/layers/model_base.py:93-199) returning a torch module
driven by HF ``generate``. The TPU equivalent bundles the loaded
functional model with a :class:`Generator`.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp

from vptq_tpu.models import load_model
from vptq_tpu.models.llama import Model
from vptq_tpu.serving.generate import Generator

__all__ = ["AutoModelForCausalLM", "Engine"]


class Engine:
    """A loaded model + generation driver."""

    def __init__(
        self,
        model: Model,
        max_seq: int = 2048,
        dtype=jnp.bfloat16,
        mesh=None,
    ):
        self.model = model
        self.config = model.cfg
        self.generator = Generator(
            model, max_seq=max_seq, dtype=dtype, mesh=mesh
        )

    def generate(
        self,
        input_ids: Sequence[int],
        max_new_tokens: int = 256,
        eos_token_id: Optional[int] = None,
        temperature: float = 0.0,
        seed: int = 0,
        stream_callback=None,
    ) -> List[int]:
        return self.generator.generate(
            input_ids,
            max_new_tokens=max_new_tokens,
            eos_token_id=eos_token_id,
            temperature=temperature,
            seed=seed,
            stream_callback=stream_callback,
        )


class AutoModelForCausalLM:
    """``from_pretrained`` parity shim for reference users."""

    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path: str,
        runtime_format: str = "int8",
        dtype=jnp.bfloat16,
        max_seq: int = 2048,
        tp: int = 0,
        **_ignored,
    ) -> Engine:
        """``tp > 1``: shard tensor-parallel over that many devices
        (shard_map Megatron placement, parallel/tp.py)."""
        mesh = None
        if tp and tp > 1:
            import jax
            import numpy as np

            from vptq_tpu.parallel.sharding import make_mesh

            if runtime_format == "codebook":
                raise ValueError(
                    "tp>1 requires runtime_format int8/int4/bf16 "
                    "(codebook does not run the shard_map path)"
                )
            mesh = make_mesh(
                data=1, model=tp,
                devices=np.asarray(jax.devices()[:tp]),
            )
        model = load_model(
            pretrained_model_name_or_path,
            dtype=dtype,
            runtime_format=runtime_format,
            mesh=mesh,
            parallel="tp",
        )
        return Engine(model, max_seq=max_seq, dtype=dtype, mesh=mesh)
