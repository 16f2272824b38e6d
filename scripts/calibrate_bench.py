"""Build + calibrate the REAL int4-mixed 7B model, export it for bench.

This is step one of the two-step measured "calibrated quality default"
number (the byte-budget stand-in `bench.py --mixed` approximates it;
this pipeline measures the real thing):

    # step 1 (host CPU — eager capture forwards + GPTQ run here):
    JAX_PLATFORMS=cpu python scripts/calibrate_bench.py -o /tmp/cal7b
    # step 2 (real TPU chip):
    python bench.py --calibrated=/tmp/cal7b

Builds the bench's Llama-2-7B-geometry codebook model (synthetic
weights — no egress; decode tok/s is weight-value independent, and
the calibration wall-time + the ranking pass's format mix are what
this measures), runs the full `quantize_model_calibrated` pipeline
(ranking pass + GPTQ + propagation, quant/calibrate.py) with the
default 4096 synthetic calibration tokens, and exports the runtime
tensors. Prints ONE JSON line with the measured calibration cost and
the chosen format mix.
"""

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output", required=True,
                   help="runtime checkpoint output dir")
    p.add_argument("--fmt", default="int4-mixed",
                   choices=("int4", "int4-mixed", "int3",
                            "int3-mixed", "int2", "int2-mixed",
                            "int8"))
    p.add_argument("--tokens", type=int, default=4096,
                   help="synthetic calibration token count")
    p.add_argument("--layers", type=int, default=32,
                   help="decoder blocks (32 = full 7B)")
    p.add_argument("--geometry", default="llama2-7b",
                   help="model geometry (tools/plan.py GEOMETRIES) — "
                        "e.g. llama2-70b with --layers 2 measures the "
                        "genuine 70B per-block calibration wall time")
    p.add_argument("--resume-dir", default=None,
                   help="checkpoint each finished block here; an "
                        "interrupted run restarted with the same dir "
                        "resumes at the first unfinished block")
    p.add_argument("--backend", default="cpu",
                   help="jax platform for the capture forwards (the "
                        "eager capture runs op-by-op: on a tunneled "
                        "TPU every dense mirror would ride the slow "
                        "host link, so CPU is the right default)")
    args = p.parse_args(argv)

    # the axon sitecustomize force-registers the tunneled TPU and sets
    # jax_platforms programmatically — the env var alone is not enough
    # (same dance as tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", args.backend)
    assert jax.default_backend() == args.backend, jax.default_backend()

    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_7b_int8
    from vptq_tpu.quant.calibrate import (
        quantize_model_calibrated,
        synthetic_calibration_tokens,
    )
    from vptq_tpu.tools.export_runtime import export_runtime

    import numpy as np

    t0 = time.time()
    model = build_7b_int8(np.random.default_rng(0), fmt="codebook",
                          geometry=args.geometry)
    if args.layers < len(model.blocks):
        import dataclasses

        from vptq_tpu.models.llama import Model

        model = Model(
            embed_tokens=model.embed_tokens,
            blocks=model.blocks[: args.layers],
            norm=model.norm,
            lm_head=model.lm_head,
            cfg=dataclasses.replace(
                model.cfg, num_hidden_layers=args.layers
            ),
        )
    build_s = time.time() - t0
    print(f"# codebook model built in {build_s:.1f}s", file=sys.stderr)

    tokens = synthetic_calibration_tokens(
        model.cfg.vocab_size, n_tokens=args.tokens
    )
    t0 = time.time()
    qmodel, report = quantize_model_calibrated(
        model, tokens, fmt=args.fmt, upload=False,
        resume_dir=args.resume_dir,
    )
    calib_s = time.time() - t0

    export_runtime(qmodel, args.output)
    summary = report["summary"]
    print(json.dumps({
        "metric": f"calibration_wall_s_{args.geometry.replace(chr(45), chr(95))}_{args.fmt}",
        "value": round(calib_s, 1),
        "unit": "s",
        "layers": args.layers,
        "calib_tokens": summary["calib_tokens"],
        "sites": summary["sites"],
        "int8_sites": summary["int8_sites"],
        "int4_sites": summary["int4_sites"],
        "int3_sites": summary["int3_sites"],
        "int3_mixed_sites": summary["int3_mixed_sites"],
        "int2_sites": summary["int2_sites"],
        "int2_mixed_sites": summary["int2_mixed_sites"],
        "output": args.output,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
