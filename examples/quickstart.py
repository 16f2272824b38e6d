"""Quickstart: load a VPTQ checkpoint and generate on TPU.

With no checkpoint at hand, this builds a small synthetic one in the
community on-disk format first (random weights), then runs the full
pipeline: ingestion -> int8 runtime re-encode -> on-device decode.
"""

import os
import sys
import tempfile

# runnable straight from a source checkout, without pip install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from vptq_tpu.models import load_model
from vptq_tpu.serving import Generator
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)
from vptq_tpu.utils.synth_tokenizer import write_byte_tokenizer

ckpt = sys.argv[1] if len(sys.argv) > 1 else None
if ckpt is None:
    ckpt = tempfile.mkdtemp(prefix="vptq_demo_")
    write_synthetic_checkpoint(
        ckpt,
        tiny_model_config(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_hidden_layers=4, num_attention_heads=8,
            num_key_value_heads=4, head_dim=32,
        ),
        vq_kwargs=dict(
            vector_len=8, num_centroids=4096, num_res_centroids=256,
            enable_norm=True, is_indice_packed=True,
        ),
    )
    write_byte_tokenizer(ckpt)
    print(f"wrote synthetic checkpoint to {ckpt}")

model = load_model(ckpt, dtype=jnp.bfloat16, runtime_format="int8")
gen = Generator(model, max_seq=512)

from transformers import AutoTokenizer

tok = AutoTokenizer.from_pretrained(ckpt)
ids = tok("The TPU is", return_tensors=None)["input_ids"]
out = gen.generate(ids, max_new_tokens=32, temperature=0.8)
print("generated:", tok.decode(out))
