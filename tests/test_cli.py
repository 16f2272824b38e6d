"""CLI end-to-end: ``python -m vptq_tpu`` one-shot and chat modes.

Drives serving/cli.py through its real path (tokenizer load, checkpoint
load, Generator, streaming) on a tiny synthetic checkpoint — the TPU
counterpart of the reference CLI (reference: vptq/app_utils.py:55-105).
"""

import io

import jax.numpy as jnp
import pytest

from vptq_tpu.serving import cli
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)
from vptq_tpu.utils.synth_tokenizer import write_byte_tokenizer


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_ckpt")
    write_synthetic_checkpoint(
        str(d),
        tiny_model_config(
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
        ),
        vq_kwargs=dict(
            vector_len=4,
            num_centroids=256,
            num_res_centroids=0,
            enable_norm=True,
            is_indice_packed=True,
        ),
        seed=3,
    )
    write_byte_tokenizer(str(d), vocab_size=512)
    return str(d)


def test_cli_one_shot_prompt(ckpt_dir, capsys):
    rc = cli.main(
        [
            "--model", ckpt_dir,
            "--prompt", "hi",
            "--max-new-tokens", "4",
            "--max-seq", "64",
            "--temperature", "0",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    # the prompt is echoed first, then the streamed completion
    assert out.startswith("hi")
    assert out.endswith("\n")


def test_cli_chat_mode(ckpt_dir, capsys, monkeypatch):
    monkeypatch.setattr(
        "sys.stdin", io.StringIO("hello\nclear\n\nexit\n")
    )
    rc = cli.main(
        [
            "--model", ckpt_dir,
            "--chat",
            "--chat-system-prompt", "be brief",
            "--max-new-tokens", "4",
            "--max-seq", "64",
            "--temperature", "0",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Assistant: " in out


def test_cli_requires_prompt_or_chat(capsys):
    rc = cli.main(["--model", "/nonexistent"])
    assert rc == 2


def test_cli_rejects_unknown_runtime_format(ckpt_dir):
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args(
            ["--model", ckpt_dir, "--runtime-format", "fp8"]
        )


def test_cli_tp_one_shot(ckpt_dir, capsys):
    """--tp 2: load sharded (shard_map placement) and serve through
    the TP generator on the virtual CPU mesh."""
    rc = cli.main(
        [
            "--model", ckpt_dir,
            "--prompt", "hi",
            "--max-new-tokens", "4",
            "--max-seq", "64",
            "--temperature", "0",
            "--tp", "2",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("hi")


def test_cli_tp_rejects_codebook(ckpt_dir):
    with pytest.raises(SystemExit):
        cli.main(
            [
                "--model", ckpt_dir,
                "--prompt", "hi",
                "--runtime-format", "codebook",
                "--tp", "2",
            ]
        )
