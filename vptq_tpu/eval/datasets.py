"""Evaluation-corpus loaders for the reference PPL protocol.

The reference's published accuracy anchor is WikiText-2 / C4
perplexity at context 4096 (reference README.md:266-279, BASELINE.md).
This module reproduces the standard protocol those numbers use:

  * ``wikitext2``: the raw test split, documents joined with "\\n\\n",
    tokenized as one stream (the GPTQ/AQLM convention the reference's
    tech report follows).
  * ``c4``: the first ``c4_docs`` documents of the ``en`` validation
    split joined the same way (the full split is ~45 GB; the standard
    eval uses a prefix — document count chosen to give well over
    256 x 4096 tokens for any LLaMA-family tokenizer).

Requires the ``datasets`` package and network access on first use —
neither is available in the bench environment (zero egress), so
imports are deferred and errors actionable. With network, the
end-to-end repro of a BASELINE.md row is one command:

    python -m vptq_tpu.eval.ppl \\
        --model VPTQ-community/Meta-Llama-3.1-8B-Instruct-v8-k65536-0-woft \\
        --dataset wikitext2

Expected results (reference README.md:274-279, tech report Table 4):
LLaMA-2 7B @ 2.02 bit -> W2 6.13 / C4 8.07; 13B @ 2.02 -> 5.32 / 7.15;
70B @ 2.07 -> 3.93 / 5.72 (fp16 baselines 5.12 / 4.57 / 3.12).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["load_eval_tokens", "EVAL_DATASETS"]

EVAL_DATASETS = ("wikitext2", "c4")


def _require_datasets():
    try:
        import datasets  # noqa: F401

        return datasets
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "the PPL dataset loaders need the `datasets` package "
            "(pip install datasets) and network access on first "
            "download; offline, pass --text FILE instead"
        ) from e


def load_eval_tokens(
    dataset: str,
    tokenizer,
    c4_docs: int = 2000,
    cache_dir: Optional[str] = None,
) -> np.ndarray:
    """Tokenized evaluation stream (1-D int32) for ``dataset``.

    ``tokenizer``: a HF tokenizer (``AutoTokenizer``). Joins documents
    with "\\n\\n" and tokenizes once — matching the protocol behind
    the reference's published numbers (see module docstring).
    """
    if dataset not in EVAL_DATASETS:
        raise ValueError(
            f"unknown dataset {dataset!r}; choices: {EVAL_DATASETS}"
        )
    ds = _require_datasets()
    if dataset == "wikitext2":
        split = ds.load_dataset(
            "wikitext", "wikitext-2-raw-v1", split="test",
            cache_dir=cache_dir,
        )
        text = "\n\n".join(split["text"])
    else:
        stream = ds.load_dataset(
            "allenai/c4", "en", split="validation", streaming=True,
            cache_dir=cache_dir,
        )
        docs = []
        for i, row in enumerate(stream):
            if i >= c4_docs:
                break
            docs.append(row["text"])
        text = "\n\n".join(docs)
    ids = tokenizer(text, return_tensors=None)["input_ids"]
    return np.asarray(ids, dtype=np.int32)
