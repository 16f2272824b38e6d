from vptq_tpu.serving.generate import Generator
from vptq_tpu.serving.prefix_cache import PrefixCache
from vptq_tpu.serving.scheduler import Request, Scheduler

__all__ = ["Generator", "PrefixCache", "Request", "Scheduler"]
