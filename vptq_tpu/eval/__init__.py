from vptq_tpu.eval.ppl import perplexity

__all__ = ["perplexity"]
