"""Multi-host initialization and mesh construction.

The reference has no distributed runtime (SURVEY.md §2.5 — multi-GPU is
accelerate's layer placement; TP lives in external forks run under
torchrun). The TPU-native story: one ``jax.distributed`` process group
per host over the slice, a single global mesh whose "model" axis rides
ICI within the slice and "data" spans hosts/slices over DCN, and GSPMD
doing all communication placement.

Typical multi-host entry:

    from vptq_tpu.parallel import distributed
    distributed.initialize()              # env-driven (TPU pods auto)
    mesh = distributed.global_mesh(data=jax.process_count())
"""

from __future__ import annotations

from typing import Optional

import jax

from vptq_tpu.parallel.sharding import make_mesh

__all__ = ["initialize", "global_mesh", "is_multi_host"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed; on TPU pods all args are inferred
    from the environment. Safe to call twice (no-op)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def is_multi_host() -> bool:
    return jax.process_count() > 1


def global_mesh(
    data: int = 1, model: Optional[int] = None
):
    """Mesh over ALL devices in the job (every process must call this
    with identical arguments).

    Layout rule: keep the "model" (TP) axis innermost so its
    collectives ride ICI within a slice; the "data" axis spans the
    slower DCN links across hosts.
    """
    return make_mesh(data=data, model=model, devices=jax.devices())
