from vptq_tpu.serving.generate import Generator

__all__ = ["Generator"]
