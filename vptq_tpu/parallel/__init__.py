from vptq_tpu.parallel.sharding import (
    make_mesh,
    replicated,
    shard_cache,
    shard_model,
)

__all__ = ["make_mesh", "replicated", "shard_cache", "shard_model"]
