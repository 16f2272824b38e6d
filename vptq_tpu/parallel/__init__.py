from vptq_tpu.parallel.pipeline import PipelineRunner, TPPipelineRunner
from vptq_tpu.parallel.ring import ring_attention
from vptq_tpu.parallel.sharding import (
    make_mesh,
    replicated,
    shard_cache,
    shard_model,
)
from vptq_tpu.parallel.tp import (
    forward_tp,
    prefill_cp,
    shard_cache_tp,
    tp_place_model,
)

__all__ = [
    "make_mesh",
    "replicated",
    "shard_cache",
    "shard_model",
    "tp_place_model",
    "forward_tp",
    "prefill_cp",
    "shard_cache_tp",
    "ring_attention",
    "PipelineRunner",
    "TPPipelineRunner",
]
