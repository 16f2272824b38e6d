"""Headline benchmark: Llama-2-7B-shape decode throughput on one TPU chip.

Method follows the reference's (AQLM protocol, BASELINE.md): start from
a 1-token prompt and measure steady-state decode tok/s. The baseline is
the reference's published LLaMA-2 7B @ 2-bit on A100: 39.9 tok/s
(reference README.md:274).

Weights are synthetic (no network egress to fetch real community
checkpoints) in the int8 runtime format — decode speed is independent
of weight values.

With NO flags it runs the FULL headline suite (VERDICT r4 item 3) —
one JSON line per metric: int8 / int4 / int2-mixed / int3-mixed
decode, 512-token prefill TTFT, and continuous-batching serving. Every
decode line carries ``bits_per_weight`` (so unlike-bit-width
comparisons are explicit — the A100 baseline rows are 2.02-bit) and
every line carries ``int8_ref_tok_s``, the SAME-RUN int8 single-stream
decode, so chip-day drift (±12% observed) divides out of
cross-round comparisons via ``value / int8_ref_tok_s``.

One-flag invocations for a single number (each prints one line):

    python bench.py --int8       # int8 decode tok/s only
    python bench.py --int4       # int4 decode tok/s
    python bench.py --int2-mixed # ~2.5-bit plane+side decode tok/s
    python bench.py --int2       # pure 2.25-bit plane decode tok/s
    python bench.py --int3-mixed # ~3.4-bit decode tok/s
    python bench.py --mixed      # int4-mixed BYTE-BUDGET STAND-IN
    python bench.py --calibrated=DIR  # REAL calibrated model decode
                                 # (DIR from scripts/calibrate_bench.py)
    python bench.py --int4 --batch=8   # batched decode throughput
    python bench.py --serving    # continuous-batching scheduler tok/s
    python bench.py --ttft       # 512-token prefill p50 latency

Each JSON line: {"metric", "value", "unit", "vs_baseline"} plus, for
decode metrics, roofline context {"gbps", "sol_frac",
"weight_bytes_per_tok", "bits_per_weight"} (achieved weight-stream
bandwidth and its fraction of the v5e 819 GB/s HBM speed-of-light).
"""

import json
import sys
import time

import numpy as np

BASELINE_TOK_S = 39.9  # LLaMA-2 7B @ 2.02 bit, A100 (README.md:274)
# per-geometry A100 decode baselines (reference README.md:274-279;
# 13B/70B rows are the 2.02/2.07-bit configs)
GEOMETRY_BASELINE_TOK_S = {
    "llama2-7b": 39.9,
    "llama2-13b": 26.9,
    "llama2-70b": 9.7,
}


def build_7b_int8(rng, fmt="int8", geometry="llama2-7b"):
    import jax.numpy as jnp

    from vptq_tpu.layers.runtime import (
        Int4Linear,
        Int8Linear,
        pick_group,
    )
    from vptq_tpu.models.llama import Attention, Block, Mlp, Model, ModelConfig
    from vptq_tpu.tools.plan import GEOMETRIES

    cfg = ModelConfig(
        **{
            **dict(
                rms_norm_eps=1e-5,
                rope_theta=10000.0,
                tie_word_embeddings=False,
                model_type="llama",
            ),
            **GEOMETRIES[geometry],
        }
    )

    # decode speed is independent of weight values; generate weights
    # on-device (host->device through this environment's tunnel runs
    # at ~15 MB/s — 6.6 GB would take minutes)
    import jax

    key_holder = [jax.random.PRNGKey(0)]

    def lin(in_f, out_f, f=None):
        key_holder[0], k1, k2 = jax.random.split(key_holder[0], 3)
        if (f or fmt) == "codebook":
            # exact compressed format: v8-k65536 + 256-centroid
            # residual (the community "3-bit" geometry). Measures the
            # dequant-per-matmul decode path (VERDICT item 1c).
            from vptq_tpu.config import VQLinearConfig
            from vptq_tpu.layers.vqlinear import VQLinear

            v, k, kres = 8, 65536, 256
            n_idx = (out_f + v - 1) // v
            lcfg = VQLinearConfig(
                in_features=in_f,
                out_features=out_f,
                vector_lens=(-1, v),
                num_centroids=(-1, k),
                num_res_centroids=(-1, kres),
                group_num=1,
                group_size=in_f,
                outlier_size=0,
                enable_norm=True,
            )
            key_holder[0], k3, k4, k5 = jax.random.split(
                key_holder[0], 4
            )
            return VQLinear(
                centroids=0.01 * jax.random.normal(
                    k1, (1, k, v), jnp.bfloat16
                ),
                ids=jax.random.randint(
                    k2, (1, n_idx, in_f), 0, k, dtype=jnp.int32
                ).astype(jnp.uint16),
                res_centroids=0.003 * jax.random.normal(
                    k3, (1, kres, v), jnp.bfloat16
                ),
                res_ids=jax.random.randint(
                    k4, (1, n_idx, in_f), 0, kres, dtype=jnp.int32
                ).astype(jnp.uint8),
                weight_scale=1.0 + 0.01 * jax.random.normal(
                    k5, (in_f,), jnp.float32
                ),
                weight_bias=jnp.zeros((in_f,), jnp.float32),
                cfg=lcfg,
            )
        if (f or fmt) == "int3":
            from vptq_tpu.layers.runtime import Int3Linear

            in_p = in_f + ((-in_f) % 2048)
            key_holder[0], k3 = jax.random.split(key_holder[0])
            return Int3Linear(
                wq2=jax.random.randint(
                    k1, (out_f, in_p // 4), -128, 128, dtype=jnp.int8
                ),
                wq1=jax.random.randint(
                    k3, (out_f, in_p // 8), -128, 128, dtype=jnp.int8
                ),
                scales=0.005 * (
                    1
                    + jax.random.uniform(
                        k2, (out_f, in_p // 128), jnp.bfloat16
                    )
                ),
                bias=None,
            )
        if (f or fmt) == "int3mixed":
            # int3-mixed decode: int3 planes + the per-column int8
            # side matrix (layers/runtime.Int3MixedLinear). Decode
            # tok/s depends only on bytes/layout, so a uniform column
            # selection stands in for the calibrated one: the same
            # 128-multiple count _select_cols picks at
            # INT3_MIXED_COL_FRACTION.
            from vptq_tpu.layers.runtime import (
                INT3_MIXED_COL_FRACTION,
                Int3MixedLinear,
                Int8Linear as _I8,
            )

            k = max(128, int(round(in_f * INT3_MIXED_COL_FRACTION)))
            k = min(((k + 127) // 128) * 128, in_f)
            key_holder[0], k3, k4 = jax.random.split(key_holder[0], 3)
            side = _I8(
                wq=jax.random.randint(
                    k3, (out_f, k), -127, 128, dtype=jnp.int8
                ),
                scales=0.005 * (
                    1 + jax.random.uniform(
                        k4, (k // 128, out_f), jnp.float32
                    )
                ),
                bias=None,
            )
            cols = jnp.asarray(
                np.linspace(0, in_f - 1, k).astype(np.int32)
            )
            return Int3MixedLinear(
                int3=lin(in_f, out_f, f="int3"),
                int8=side,
                col_idx=cols,
                bias=None,
            )
        if (f or fmt) == "int2":
            from vptq_tpu.layers.runtime import Int2Linear

            in_p = in_f + ((-in_f) % 1024)
            return Int2Linear(
                wq=jax.random.randint(
                    k1, (out_f, in_p // 4), -128, 128, dtype=jnp.int8
                ),
                scales=0.005 * (
                    1
                    + jax.random.uniform(
                        k2, (out_f, in_p // 64), jnp.bfloat16
                    )
                ),
                bias=None,
            )
        if (f or fmt) == "int2mixed":
            # int2-mixed decode: the ~2.5-bit serving operating point
            # (2-bit plane + per-column int8 side matrix,
            # layers/runtime.Int2MixedLinear). Uniform column stand-in
            # for the calibrated selection, as with int3mixed.
            from vptq_tpu.layers.runtime import (
                INT2_MIXED_COL_FRACTION,
                Int2MixedLinear,
                Int8Linear as _I8,
            )

            k = max(128, int(round(in_f * INT2_MIXED_COL_FRACTION)))
            k = min(((k + 127) // 128) * 128, in_f)
            key_holder[0], k3, k4 = jax.random.split(key_holder[0], 3)
            side = _I8(
                wq=jax.random.randint(
                    k3, (out_f, k), -127, 128, dtype=jnp.int8
                ),
                scales=0.005 * (
                    1 + jax.random.uniform(
                        k4, (k // 128, out_f), jnp.float32
                    )
                ),
                bias=None,
            )
            cols = jnp.asarray(
                np.linspace(0, in_f - 1, k).astype(np.int32)
            )
            return Int2MixedLinear(
                int2=lin(in_f, out_f, f="int2"),
                int8=side,
                col_idx=cols,
                bias=None,
            )
        if (f or fmt) == "int4":
            in_p = in_f + ((-in_f) % 2048)
            wq = jax.random.randint(
                k1, (out_f, in_p // 2), -128, 128, dtype=jnp.int8
            )
            scales = 0.005 * (
                1
                + jax.random.uniform(
                    k2, (in_p // 128, out_f), jnp.bfloat16
                )
            )
            return Int4Linear(wq=wq, scales=scales, bias=None)
        g = pick_group(in_f)
        in_p = in_f + ((-in_f) % g)
        wq = jax.random.randint(
            k1, (out_f, in_p), -127, 128, dtype=jnp.int8
        )
        scales = 0.005 * (
            1 + jax.random.uniform(k2, (in_p // g, out_f), jnp.float32)
        )
        return Int8Linear(wq=wq, scales=scales, bias=None)

    h, inter = cfg.hidden_size, cfg.intermediate_size
    qkv_out = (
        cfg.num_attention_heads + 2 * cfg.num_key_value_heads
    ) * cfg.head_dim
    blocks = []
    for i in range(cfg.num_hidden_layers):
        bf = None
        if fmt == "int4mixed":
            # byte-budget stand-in for the calibrated int4-mixed
            # default (quant/calibrate.py MIXED_INT8_FRACTION=0.375):
            # the ranking pass concentrates the int8 budget in the
            # early blocks on measured models, so the first 3/8 of
            # blocks carry the int8 bytes here
            bf = (
                "int8"
                if i < (3 * cfg.num_hidden_layers) // 8
                else "int4"
            )
        blocks.append(
            Block(
                input_layernorm=jnp.ones(h, jnp.float32),
                attn=Attention(
                    q_proj=None,
                    k_proj=None,
                    v_proj=None,
                    o_proj=lin(
                        cfg.num_attention_heads * cfg.head_dim,
                        h, f=bf,
                    ),
                    qkv_proj=lin(h, qkv_out, f=bf),
                ),
                post_attention_layernorm=jnp.ones(h, jnp.float32),
                mlp=Mlp(
                    gate_proj=None,
                    up_proj=None,
                    down_proj=lin(inter, h, f=bf),
                    gate_up_proj=lin(h, 2 * inter, f=bf),
                ),
            )
        )
    key_holder[0], k1 = jax.random.split(key_holder[0])
    embed = 0.01 * jax.random.normal(
        k1, (cfg.vocab_size, h), jnp.bfloat16
    )
    # lm_head in int8 — the loader's quantize_lm_head=True serving
    # config (~0.3% logit noise, half the decode HBM traffic);
    # int8 also under --int4 (logit fidelity matters most there)
    lm_head = lin(h, cfg.vocab_size, f="int8")
    return Model(
        embed_tokens=embed,
        blocks=tuple(blocks),
        norm=jnp.ones(h, jnp.float32),
        lm_head=lm_head,
        cfg=cfg,
    )


def ttft(model, prompt_len=512):
    """p50 prefill latency (time-to-first-token core cost)."""
    import jax
    import jax.numpy as jnp

    from vptq_tpu.models.llama import forward, init_cache

    prefill = jax.jit(
        lambda m, t, c: forward(
            m, t, c, dtype=jnp.bfloat16, fresh_prefill=True
        )
    )
    tokens = jnp.ones((1, prompt_len), jnp.int32)
    times = []
    for i in range(4):
        cache = init_cache(model.cfg, 1, prompt_len + 8, jnp.bfloat16)
        t0 = time.time()
        logits, cache = prefill(model, tokens, cache)
        _ = int(np.asarray(logits[0, -1, :8]).argmax())  # sync
        times.append(time.time() - t0)
    times = sorted(times[1:])  # drop compile
    return times[len(times) // 2]


def logical_weights(cfg) -> int:
    """Logical (unpadded) weight count of blocks + lm_head — the
    denominator for honest bits/weight."""
    h, inter = cfg.hidden_size, cfg.intermediate_size
    qkv_out = (
        cfg.num_attention_heads + 2 * cfg.num_key_value_heads
    ) * cfg.head_dim
    per_block = (
        h * qkv_out
        + (cfg.num_attention_heads * cfg.head_dim) * h
        + 2 * inter * h  # gate_up
        + inter * h  # down
    )
    return per_block * cfg.num_hidden_layers + cfg.vocab_size * h


def run_decode(model, fmt, geometry, steps, batch, max_seq):
    """Single decode measurement; returns the JSON record dict."""
    import jax
    import jax.numpy as jnp

    from vptq_tpu.models.llama import init_cache
    from vptq_tpu.serving.generate import decode_loop
    from vptq_tpu.utils.profiling import V5E_HBM_GBPS

    cache = init_cache(model.cfg, batch, max_seq, jnp.bfloat16)
    first = jnp.ones((batch,), jnp.int32)
    key = jax.random.PRNGKey(0)
    temp = jnp.asarray(0.0, jnp.float32)

    t0 = time.time()
    toks, cache2 = decode_loop(
        model, first, cache, key, temp, steps=steps
    )
    toks.block_until_ready()
    _ = int(np.asarray(toks)[-1, 0])  # force full sync
    print(f"# warmup+compile {time.time()-t0:.1f}s", file=sys.stderr)

    # timed run (recreate cache; decode_loop donates it)
    times = []
    for _ in range(3):
        cache = init_cache(model.cfg, batch, max_seq, jnp.bfloat16)
        t0 = time.time()
        toks, cache = decode_loop(
            model, first, cache, key, temp, steps=steps
        )
        _ = int(np.asarray(toks)[-1, 0])  # host sync
        times.append(time.time() - t0)

    best = min(times)
    tok_s = steps * batch / best

    # roofline context (VERDICT r2 item 7): decode reads every weight
    # byte once per step — achieved weight GB/s and fraction of the
    # v5e HBM speed-of-light make sub-tok/s regressions driver-visible
    weight_bytes = sum(
        x.nbytes
        for x in jax.tree.leaves((model.blocks, model.lm_head))
    )
    gbps = weight_bytes * (tok_s / batch) / 1e9
    return {
        "metric": f"{geometry.replace(chr(45), chr(95))}_decode_tok_s_1chip"
        + ("" if fmt == "int8" else f"_{fmt}")
        + (f"_b{batch}" if batch > 1 else ""),
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(
            tok_s
            / GEOMETRY_BASELINE_TOK_S.get(geometry, BASELINE_TOK_S),
            3,
        ),
        "gbps": round(gbps, 1),
        "sol_frac": round(gbps / V5E_HBM_GBPS, 3),
        "weight_bytes_per_tok": weight_bytes,
        "bits_per_weight": round(
            weight_bytes * 8 / logical_weights(model.cfg), 2
        ),
    }


def run_serving(model, fmt, chunk, depth):
    """Continuous-batching throughput; returns the JSON record dict.

    16 requests with 48-96-token prompts admitted mid-stream into 8
    slots, 128 new tokens each — prefill chunks interleave with decode
    (VERDICT r1 item 4's measured number).
    """
    from vptq_tpu.serving.scheduler import Scheduler

    rng2 = np.random.default_rng(7)
    sched = Scheduler(
        model, max_batch=8, max_seq=256, chunk=chunk,
        depth=depth, prompt_buckets=(64, 128),
    )
    reqs = [
        rng2.integers(
            1, 32000, size=int(rng2.integers(48, 97))
        ).tolist()
        for _ in range(16)
    ]
    # warm the compile caches: enough same-bucket requests per
    # prompt bucket that the BATCHED admission prefill (padded to
    # admit_parallel rows, scheduler._prefill_group) compiles too
    for _ in range(4):
        sched.submit(reqs[0][:8], max_new_tokens=4)
    for _ in range(4):
        sched.submit(reqs[0][:80], max_new_tokens=4)
    for attempt in range(3):
        # the tunnel's remote_compile sporadically drops the
        # connection on the big batched-prefill compile right after
        # the multi-GB model upload — transient; the scheduler state
        # stays consistent (the failed admission is still queued), so
        # retrying run() recompiles and continues
        try:
            sched.run()
            break
        except Exception as e:  # noqa: BLE001
            if "remote_compile" not in str(e) or attempt == 2:
                raise
            print(
                f"# warmup retry {attempt + 1}: transient "
                f"tunnel compile error", file=sys.stderr,
            )
    for k in sched.stats:
        sched.stats[k] = 0 if isinstance(sched.stats[k], int) else 0.0
    t0 = time.time()
    ids = [sched.submit(r, max_new_tokens=128) for r in reqs]
    out = sched.run()
    dt = time.time() - t0
    # run() returns all finished requests incl. warmups — count only
    # the timed ones
    total = sum(len(out[rid]) for rid in ids)
    s = sched.stats
    return {
        "metric": f"llama2_7b_serving_tok_s_{fmt}_slots8"
        + (f"_c{chunk}" if chunk != 16 else "")
        + (f"_d{depth}" if depth != 2 else ""),
        "value": round(total / dt, 2),
        "unit": "tok/s",
        "vs_baseline": round(total / dt / BASELINE_TOK_S, 3),
        # host-wall decomposition (scheduler.stats): sync_wait =
        # blocked on device results; the rest of the wall is
        # device-overlapped host work
        "wall_s": round(dt, 2),
        "sync_wait_s": round(s["sync_wait_s"], 2),
        "dispatch_s": round(s["dispatch_s"], 2),
        "admit_s": round(s["admit_s"], 2),
        "batched_admissions": s["batched_admissions"],
        "prefill_ahead": s["prefill_ahead"],
        "handoffs": s["handoffs"],
        "steps": s["steps"],
        "chunks": s["chunks"],
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    # AQLM protocol (tech report §5): 1-token prompt, 256 new tokens
    steps = int(args[0]) if args else 256
    metric = "ttft" if "--ttft" in sys.argv else "decode"
    if "--serving" in sys.argv:
        metric = "serving"
    fmt = None
    if "--int8" in sys.argv:
        fmt = "int8"
    elif "--int4" in sys.argv:
        fmt = "int4"
    elif "--int3-mixed" in sys.argv:
        fmt = "int3mixed"
    elif "--int3" in sys.argv:
        fmt = "int3"
    elif "--int2-mixed" in sys.argv:
        fmt = "int2mixed"
    elif "--int2" in sys.argv:
        fmt = "int2"
    elif "--mixed" in sys.argv:
        fmt = "int4mixed"
    elif "--codebook" in sys.argv:
        fmt = "codebook"
    batch = 1
    prompt_len = 512
    calibrated_dir = None
    geometry = "llama2-7b"
    chunk = 16
    depth = 2
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--chunk="):
            chunk = int(a.split("=")[1])
        if a.startswith("--depth="):
            depth = int(a.split("=")[1])
        if a.startswith("--prompt="):
            prompt_len = int(a.split("=")[1])
        if a.startswith("--calibrated="):
            calibrated_dir = a.split("=", 1)[1]
        if a.startswith("--geometry="):
            geometry = a.split("=", 1)[1]
    max_seq = max(512, steps + 8)

    rng = np.random.default_rng(0)

    if calibrated_dir is not None:
        # the REAL calibrated model (scripts/calibrate_bench.py output:
        # ranking pass + GPTQ, not the --mixed byte-budget stand-in).
        # Host->device upload of the actual tensors rides the tunnel —
        # the build time printed below includes it.
        from vptq_tpu.tools.export_runtime import load_runtime_model

        t0 = time.time()
        model = load_runtime_model(calibrated_dir)
        print(f"# model built in {time.time()-t0:.1f}s", file=sys.stderr)
        # keep metric-name continuity: the historic default calibrated
        # checkpoint is int4-mixed ("..._int4mixed_calibrated"); pass a
        # format flag to label other calibrated formats
        fmt = fmt or "int4mixed"
        if metric == "serving":
            print(json.dumps(
                run_serving(model, f"{fmt}_calibrated", chunk, depth)
            ))
            return
        print(json.dumps(run_decode(
            model, f"{fmt}_calibrated", geometry, steps, batch, max_seq
        )))
        return

    if fmt is None and metric == "decode":
        # FULL headline suite (VERDICT r4 item 3): int8 first — its
        # single-stream decode is the same-run normalizer every other
        # line carries, so chip-day drift (±12% observed) divides out.
        # Records STREAM as soon as they are measured (a driver
        # timeout mid-suite still captures everything finished); the
        # round's flagship (int2-mixed) is measured — and printed —
        # LAST, because the driver parses the final JSON line as the
        # headline metric.
        int8_ref = None

        def emit(rec):
            rec["int8_ref_tok_s"] = int8_ref
            if rec["unit"] == "tok/s" and int8_ref:
                rec["vs_int8_same_run"] = round(
                    rec["value"] / int8_ref, 3
                )
            print(json.dumps(rec), flush=True)

        for f in ("int8", "int4", "int3mixed", "int2mixed"):
            t0 = time.time()
            model = build_7b_int8(rng, fmt=f, geometry=geometry)
            print(
                f"# {f} model built in {time.time()-t0:.1f}s",
                file=sys.stderr,
            )
            rec = run_decode(model, f, geometry, steps, batch, max_seq)
            if f == "int8":
                int8_ref = rec["value"]
            emit(rec)
            if f == "int8":
                emit(run_serving(model, f, chunk, depth))
            if f == "int4":
                t = ttft(model, prompt_len=prompt_len)
                emit({
                    "metric": f"llama2_7b_prefill{prompt_len}"
                    "_p50_s_int4",
                    "value": round(t, 4),
                    "unit": "s",
                    "vs_baseline": 0.0,  # reference publishes no TTFT
                })
            del model
        return

    fmt = fmt or "int8"
    t0 = time.time()
    model = build_7b_int8(rng, fmt=fmt, geometry=geometry)
    print(f"# model built in {time.time()-t0:.1f}s", file=sys.stderr)

    if metric == "serving":
        print(json.dumps(run_serving(model, fmt, chunk, depth)))
        return

    if metric == "ttft":
        t = ttft(model, prompt_len=prompt_len)
        print(
            json.dumps(
                {
                    "metric": f"llama2_7b_prefill{prompt_len}_p50_s"
                    + ("" if fmt == "int8" else f"_{fmt}"),
                    "value": round(t, 4),
                    "unit": "s",
                    "vs_baseline": 0.0,  # reference publishes no TTFT
                }
            )
        )
        return

    print(json.dumps(
        run_decode(model, fmt, geometry, steps, batch, max_seq)
    ))


if __name__ == "__main__":
    main()
