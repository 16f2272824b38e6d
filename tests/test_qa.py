"""Zero-shot QA harness (eval/qa.py): loader formats, batched
loglikelihood vs naive per-pair scoring, CLI end-to-end on a synthetic
fixture (VERDICT r3 item 3; reference AvgQA column README.md:272-279)."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from vptq_tpu.eval.qa import (
    QAItem,
    evaluate_qa,
    load_task,
    loglikelihoods,
)
from vptq_tpu.models import load_model
from vptq_tpu.models.llama import forward, init_cache
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)


def _model(tmp_path):
    write_synthetic_checkpoint(
        tmp_path,
        tiny_model_config(),
        vq_kwargs=dict(
            vector_len=4, num_centroids=64, num_res_centroids=16,
            enable_norm=True, is_indice_packed=True,
        ),
        seed=13,
    )
    return load_model(
        str(tmp_path), dtype=jnp.float32, runtime_format="bf16"
    )


def _naive_ll(model, ctx, cont):
    """Reference scoring: one unbatched unpadded forward per pair."""
    full = list(ctx) + list(cont)
    toks = jnp.asarray(full, jnp.int32)[None, :]
    cache = init_cache(model.cfg, 1, len(full), jnp.float32)
    logits, _ = forward(model, toks, cache, dtype=jnp.float32)
    logp = jax.nn.log_softmax(
        np.asarray(logits, np.float64)[0], axis=-1
    )
    s = 0.0
    for pos in range(max(len(ctx) - 1, 0), len(full) - 1):
        s += logp[pos, full[pos + 1]]
    return float(s)


def test_loglikelihoods_match_naive(tmp_path):
    """Bucketed/padded batch scoring == per-pair unpadded forwards,
    across bucket boundaries and ragged batch tails."""
    model = _model(tmp_path)
    rng = np.random.default_rng(3)
    V = model.cfg.vocab_size
    pairs = []
    for ctx_len, cont_len in [
        (5, 3), (1, 1), (30, 4), (40, 25), (2, 60), (7, 2), (33, 31),
    ]:
        pairs.append(
            (
                rng.integers(0, V, ctx_len).tolist(),
                rng.integers(0, V, cont_len).tolist(),
            )
        )
    got = loglikelihoods(
        model, pairs, batch=3, max_seq=128, dtype=jnp.float32
    )
    want = np.array([_naive_ll(model, c, t) for c, t in pairs])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_evaluate_qa_argmax_and_norm(tmp_path):
    """acc follows the raw-ll argmax; acc_norm divides by continuation
    byte length. Gold labels set from the naive scores so the expected
    accuracies are exactly 1.0."""
    model = _model(tmp_path)

    def tok(text):
        return [b % model.cfg.vocab_size for b in text.encode()]

    items = [
        QAItem(
            context="Question: ab?\nAnswer:",
            choices=[" xy", " longer answer text"],
            gold=0,
        ),
        QAItem(
            context="",
            choices=["suffix a", "suffix a"],
            gold=0,
            contexts=["Alpha beta", "Gamma delta epsilon"],
        ),
    ]
    # re-point gold at the naive winner so acc must be 1.0
    for it in items:
        scores = []
        for i, c in enumerate(it.choices):
            ctx = it.contexts[i] if it.contexts else it.context
            scores.append(_naive_ll(model, tok(ctx), tok(c)))
        it.gold = int(np.argmax(scores))
    res = evaluate_qa(
        model, items, tok, batch=2, max_seq=128, dtype=jnp.float32
    )
    assert res["acc"] == 1.0
    assert res["n"] == 2
    assert 0.0 <= res["acc_norm"] <= 1.0


def _write(path, records, jsonl):
    with open(path, "w") as f:
        if jsonl:
            for r in records:
                f.write(json.dumps(r) + "\n")
        else:
            json.dump(records, f)


def test_task_loaders(tmp_path):
    arc = [
        {
            "question": "Which is a fruit?",
            "choices": {
                "text": ["apple", "rock", "chair"],
                "label": ["A", "B", "C"],
            },
            "answerKey": "A",
        }
    ]
    _write(tmp_path / "arc.jsonl", arc, jsonl=True)
    items = load_task("arc_easy", str(tmp_path / "arc.jsonl"))
    assert items[0].gold == 0
    assert items[0].context.startswith("Question: Which is a fruit?")
    assert items[0].choices == [" apple", " rock", " chair"]

    hs = [
        {
            "activity_label": "Cooking",
            "ctx_a": "A person stirs a pot.",
            "ctx_b": "then they",
            "endings": ["serve the food.", "fly away. [title]"],
            "label": "0",
        }
    ]
    _write(tmp_path / "hs.json", hs, jsonl=False)
    items = load_task("hellaswag", str(tmp_path / "hs.json"))
    assert items[0].gold == 0
    assert items[0].context.startswith("Cooking: A person stirs")
    assert "[title]" not in items[0].choices[1]

    piqa = [{"goal": "open a jar", "sol1": "twist the lid",
             "sol2": "eat the jar", "label": 0}]
    _write(tmp_path / "piqa.jsonl", piqa, jsonl=True)
    items = load_task("piqa", str(tmp_path / "piqa.jsonl"))
    assert items[0].choices == [" twist the lid", " eat the jar"]

    wg = [{"sentence": "The cup would not fit because _ was too big.",
           "option1": "the cup", "option2": "the shelf",
           "answer": "1"}]
    _write(tmp_path / "wg.jsonl", wg, jsonl=True)
    items = load_task("winogrande", str(tmp_path / "wg.jsonl"))
    assert items[0].gold == 0
    # per-choice contexts: the option fills the blank; the shared
    # suffix is the scored continuation
    assert items[0].contexts == [
        "The cup would not fit because the cup",
        "The cup would not fit because the shelf",
    ]
    assert items[0].choices[0] == items[0].choices[1] == (
        " was too big."
    )


def test_qa_cli_end_to_end(tmp_path, capsys):
    """The VERDICT done-gate: `python -m vptq_tpu.eval.qa --model DIR
    --task arc_easy --data FILE` on a synthetic fixture."""
    from vptq_tpu.eval.qa import main

    write_synthetic_checkpoint(
        tmp_path / "ckpt",
        tiny_model_config(),
        vq_kwargs=dict(
            vector_len=4, num_centroids=64, num_res_centroids=16,
            enable_norm=True, is_indice_packed=True,
        ),
        seed=13,
    )
    records = [
        {
            "question": f"Pick one ({i})",
            "choices": {"text": ["aa", "bb"], "label": ["A", "B"]},
            "answerKey": "A",
        }
        for i in range(3)
    ]
    _write(tmp_path / "arc.jsonl", records, jsonl=True)
    rc = main(
        [
            "--model", str(tmp_path / "ckpt"),
            "--task", "arc_easy",
            "--data", str(tmp_path / "arc.jsonl"),
            "--tokenizer", "byte",
            "--runtime-format", "bf16",
            "--batch", "2",
            "--max-seq", "64",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "arc_easy: acc" in out
    assert "headline metric = acc_norm" in out


def _write_toy_hf_tokenizer(d):
    """A real HF-format fast tokenizer (tokenizer.json, ~200-word
    WordLevel vocab) — the integration fixture VERDICT r4 item 8
    asked for, so the first real-checkpoint run is not the
    tokenizer path's integration test."""
    import json as _json
    from pathlib import Path

    d = Path(d)
    d.mkdir(parents=True, exist_ok=True)
    words = (
        "the a an is are of and to in for on pick one two three "
        "answer question choice correct wrong true false yes no "
        "what which where who why how it this that".split()
    )
    words += [f"w{i}" for i in range(200 - len(words) - 2)]
    vocab = {"<unk>": 0, ":": 1}
    for w in words:
        vocab[w] = len(vocab)
    tok = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [
            {
                "id": 0, "content": "<unk>", "single_word": False,
                "lstrip": False, "rstrip": False,
                "normalized": False, "special": True,
            }
        ],
        "normalizer": {"type": "Lowercase"},
        "pre_tokenizer": {"type": "Whitespace"},
        "post_processor": None,
        "decoder": None,
        "model": {
            "type": "WordLevel",
            "vocab": vocab,
            "unk_token": "<unk>",
        },
    }
    (d / "tokenizer.json").write_text(_json.dumps(tok))
    (d / "tokenizer_config.json").write_text(
        _json.dumps(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "model_max_length": 1 << 20,
            }
        )
    )
    return d


def test_qa_cli_with_real_hf_tokenizer(tmp_path, capsys):
    """End-to-end through the REAL transformers tokenizer path
    (AutoTokenizer on an HF-format tokenizer.json fixture), not the
    byte fallback — VERDICT r4 item 8."""
    from vptq_tpu.eval.qa import main

    write_synthetic_checkpoint(
        tmp_path / "ckpt",
        tiny_model_config(),
        vq_kwargs=dict(
            vector_len=4, num_centroids=64, num_res_centroids=16,
            enable_norm=True, is_indice_packed=True,
        ),
        seed=13,
    )
    tok_dir = _write_toy_hf_tokenizer(tmp_path / "tok")

    # sanity: the fixture loads through transformers and tokenizes
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(str(tok_dir))
    ids = tok("pick one answer", add_special_tokens=False)[
        "input_ids"
    ]
    assert len(ids) == 3 and all(0 < i < 200 for i in ids)

    records = [
        {
            "question": f"pick one w{i}",
            "choices": {
                "text": ["true answer", "wrong w9"],
                "label": ["A", "B"],
            },
            "answerKey": "A",
        }
        for i in range(3)
    ]
    _write(tmp_path / "arc.jsonl", records, jsonl=True)
    rc = main(
        [
            "--model", str(tmp_path / "ckpt"),
            "--task", "arc_easy",
            "--data", str(tmp_path / "arc.jsonl"),
            "--tokenizer", str(tok_dir),
            "--runtime-format", "bf16",
            "--batch", "2",
            "--max-seq", "64",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "arc_easy: acc" in out
