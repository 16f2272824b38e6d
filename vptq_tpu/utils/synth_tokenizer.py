"""Minimal byte-level tokenizer factory.

The environment has no network egress, so real HF tokenizers cannot be
downloaded; CLI/web tests and demos need *a* tokenizer directory. This
builds a byte-level vocabulary (256 bytes + specials) via the
``tokenizers`` library bundled with transformers, with a trivial chat
template, and saves it in HF layout so ``AutoTokenizer.from_pretrained``
works on it.
"""

from __future__ import annotations

from pathlib import Path

__all__ = ["write_byte_tokenizer"]

_CHAT_TEMPLATE = (
    "{% for message in messages %}"
    "{{ message['role'] }}: {{ message['content'] }}\n"
    "{% endfor %}"
    "{% if add_generation_prompt %}assistant:{% endif %}"
)


def write_byte_tokenizer(path: str, vocab_size: int = 512) -> Path:
    """Write a byte-level tokenizer dir loadable by AutoTokenizer.

    ``vocab_size`` must be >= 259 (256 bytes + bos/eos/pad); extra ids
    stay unused so the tokenizer fits any synth checkpoint vocab.
    """
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    if vocab_size < 259:
        raise ValueError("vocab_size must be >= 259")

    # ids 0..2: specials; 3..258: bytes via the ByteLevel alphabet
    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2}
    for i, ch in enumerate(sorted(alphabet)):
        vocab[ch] = 3 + i
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(
        add_prefix_space=False
    )
    tok.decoder = decoders.ByteLevel()

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<s>",
        eos_token="</s>",
        pad_token="<pad>",
        chat_template=_CHAT_TEMPLATE,
    )
    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    fast.save_pretrained(out)
    return out
