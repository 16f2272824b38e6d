from vptq_tpu.eval.ppl import perplexity
from vptq_tpu.eval.qa import evaluate_qa, load_task

__all__ = ["perplexity", "evaluate_qa", "load_task"]
