"""Multi-chip serving walkthrough, runnable anywhere.

Demonstrates every parallelism mode on a virtual 8-device CPU mesh
(set up below) with a tiny synthetic checkpoint — the same code
drives real v5e meshes; see README §Multi-chip serving and
docs/deepseek.md for production-size recipes.

  1. plan      — budget table + AOT compile, zero weight bytes
  2. TP        — shard_map Megatron serving (loader → Generator)
  3. DP×TP     — batch over the data axis
  4. CP        — ring-attention prefill for long prompts
  5. PP        — layer-stage placement + 1F microbatch schedule

Run: python examples/multichip_demo.py
"""

import os
import sys
import tempfile

# runnable straight from a source checkout, without pip install
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import jax.numpy as jnp

from vptq_tpu.models import load_model
from vptq_tpu.models.llama import forward, init_cache
from vptq_tpu.parallel import (
    PipelineRunner,
    forward_tp,
    make_mesh,
    prefill_cp,
    shard_cache_tp,
)
from vptq_tpu.parallel.tp import tp_specs
from vptq_tpu.serving import Generator
from vptq_tpu.tools import plan
from vptq_tpu.utils.synth_checkpoint import (
    tiny_model_config,
    write_synthetic_checkpoint,
)


def main() -> None:
    # 1. plan a deployment before moving any bytes
    print("== plan: llama2-70b @ int4 on 8 chips ==")
    plan.main(["--geometry", "llama2-70b", "--format", "int4",
               "--chips", "8"])

    ckpt = tempfile.mkdtemp(prefix="vptq_demo_")
    write_synthetic_checkpoint(
        ckpt, tiny_model_config(tie_word_embeddings=False), seed=5
    )

    # 2. Megatron shard_map TP end-to-end
    mesh = make_mesh(
        data=1, model=2, devices=np.asarray(jax.devices()[:2])
    )
    model_tp = load_model(
        ckpt, runtime_format="int8", mesh=mesh  # parallel="tp" default
    )
    gen = Generator(model_tp, max_seq=64, prompt_buckets=(16,),
                    mesh=mesh)
    print("TP tokens:", gen.generate([1, 2, 3], max_new_tokens=8))

    # 3+4. DP×TP mesh; CP ring prefill for the fresh prompt
    mesh4 = make_mesh(
        data=2, model=2, devices=np.asarray(jax.devices()[:4])
    )
    model4 = load_model(
        ckpt, runtime_format="int8", mesh=mesh4
    )
    specs = tp_specs(model4)
    tokens = jnp.asarray([[1, 7, 42, 9, 3, 5, 2, 8]], jnp.int32)
    cache = shard_cache_tp(init_cache(model4.cfg, 1, 32), mesh4)
    with mesh4:
        logits, cache = prefill_cp(
            model4, tokens, cache, specs, mesh4
        )
        logits, cache = forward_tp(
            model4,
            jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32),
            cache, specs, mesh4,
        )
    print("CP prefill + TP decode next token:",
          int(np.asarray(logits)[0, -1].argmax()))

    # 5. pipeline stages with microbatch interleaving
    plain = load_model(ckpt, runtime_format="int8")
    pp = PipelineRunner(plain, jax.devices()[:2], max_seq=32, batch=2)
    outs = pp.forward_pipelined(
        [jnp.asarray([[1, 2, 3]], jnp.int32),
         jnp.asarray([[9, 8, 7]], jnp.int32)],
        fresh=True,
    )
    print("PP microbatch next tokens:",
          [int(np.asarray(o)[0, -1].argmax()) for o in outs])
    print("demo OK")


if __name__ == "__main__":
    main()
