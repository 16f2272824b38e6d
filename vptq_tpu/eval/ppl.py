"""Perplexity evaluation (the reference's accuracy metric).

The reference reports WikiText-2 / C4 perplexity at context 4096
(BASELINE.md; tech report §5). This computes PPL over a token stream
with non-overlapping (or strided) windows, fully jitted per window.

Usage (library):
    ppl = perplexity(model, token_ids, seq_len=4096)

CLI (local text or the reference's published datasets):
    python -m vptq_tpu.eval.ppl --model DIR --text FILE \
        [--tokenizer DIR] [--seq-len 4096] [--runtime-format int8]
    python -m vptq_tpu.eval.ppl --model <hub-id-or-dir> \
        --dataset wikitext2|c4

The --dataset path reproduces the protocol behind BASELINE.md's rows
end to end (hub checkpoint download -> dataset download -> tokenize ->
ctx-4096 windows); expected numbers and citations in
vptq_tpu/eval/datasets.py.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vptq_tpu.models.llama import Model, forward, init_cache

__all__ = ["perplexity"]


@functools.partial(jax.jit, static_argnames=("dtype",))
def _window_nll(model: Model, tokens: jnp.ndarray, dtype=jnp.bfloat16):
    """Sum of next-token NLL and count over one (1, S) window."""
    cache = init_cache(model.cfg, 1, tokens.shape[1], dtype)
    logits, _ = forward(model, tokens, cache, dtype=dtype)
    logp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), axis=-1)
    targets = tokens[0, 1:]
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    return jnp.sum(nll), nll.shape[0]


def perplexity(
    model: Model,
    token_ids: Sequence[int] | np.ndarray,
    seq_len: int = 4096,
    dtype=jnp.bfloat16,
    progress: bool = False,
) -> float:
    """PPL over non-overlapping ``seq_len`` windows (drops the tail
    shorter than 2 tokens)."""
    ids = np.asarray(token_ids, dtype=np.int32)
    if ids.ndim != 1:
        raise ValueError("token_ids must be 1-D")
    n_windows = len(ids) // seq_len
    total_nll, total_cnt = 0.0, 0
    windows = [
        ids[i * seq_len: (i + 1) * seq_len] for i in range(n_windows)
    ]
    tail = ids[n_windows * seq_len:]
    if len(tail) >= 2 and n_windows == 0:
        windows.append(tail)
    for i, w in enumerate(windows):
        nll, cnt = _window_nll(model, jnp.asarray(w)[None, :], dtype)
        total_nll += float(nll)
        total_cnt += int(cnt)
        if progress:
            print(
                f"window {i + 1}/{len(windows)}: "
                f"ppl so far {np.exp(total_nll / total_cnt):.4f}",
                flush=True,
            )
    if total_cnt == 0:
        raise ValueError("not enough tokens for one window")
    return float(np.exp(total_nll / total_cnt))


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--tokenizer", default="")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--text", help="plain-text file to evaluate")
    src.add_argument(
        "--dataset", choices=("wikitext2", "c4"),
        help="reference eval corpus (needs `datasets` + network; "
        "expected numbers in eval/datasets.py / BASELINE.md)",
    )
    p.add_argument("--seq-len", type=int, default=4096)
    p.add_argument(
        "--runtime-format", default="int8",
        choices=(
            "int8", "int4", "int4-mixed", "int3", "int3-mixed",
            "int2", "int2-mixed",
            "bf16", "codebook",
        ),
    )
    args = p.parse_args(argv)

    from transformers import AutoTokenizer

    from vptq_tpu.models import load_model

    tok = AutoTokenizer.from_pretrained(args.tokenizer or args.model)
    if args.dataset:
        from vptq_tpu.eval.datasets import load_eval_tokens

        ids = load_eval_tokens(args.dataset, tok)
    else:
        with open(args.text) as f:
            text = f.read()
        ids = tok(text, return_tensors=None)["input_ids"]

    model = load_model(
        args.model, dtype=jnp.bfloat16,
        runtime_format=args.runtime_format,
    )
    ppl = perplexity(model, ids, seq_len=args.seq_len, progress=True)
    print(f"perplexity: {ppl:.4f} ({len(ids)} tokens, "
          f"ctx {args.seq_len})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
