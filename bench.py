#!/usr/bin/env python3
"""Benchmark: anneal moves/sec/chip vs the reference C implementation.

Baseline (BASELINE.md): reference does 16.9k moves/s at n=2000 on one CPU
core, where one move = one full-parse re-cost.  We measure the identical
unit of work — one exact full-block re-cost + repair per chain per
iteration — on one chip with C parallel chains.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

N = 2048                 # match the reference's measured n=2000 scale
CHAINS = int(os.environ.get("BENCH_CHAINS", "512"))
WARM_ITERS = None  # warmup uses the timed program (single compile)
BASELINE_MOVES_PER_S = 16900.0   # reference @ n=2000 (BASELINE.md)


def main():
    import jax

    # amortize the (tunneled) TPU compile across runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from megalania_tpu.anneal import engine
    from megalania_tpu.anneal.config import AnnealConfig

    data = open(os.path.join(os.path.dirname(__file__) or ".",
                             "SURVEY.md"), "rb").read()[:N]
    # one kernel grid step for all chains when the lane constraint allows;
    # cb caps at 512 (the n=2048 VMEM budget), larger CHAINS add grid
    # steps — cb must DIVIDE the chain count (kernel grid contract)
    cb = 128
    if CHAINS % 128 == 0:
        cb = max(d for d in (512, 384, 256, 128) if CHAINS % d == 0)
    cfg = AnnealConfig(
        chains=CHAINS, chain_block=cb,
        kernel=os.environ.get("BENCH_KERNEL", "auto"),
        ranker=os.environ.get("BENCH_RANKER", "auto"),
        proposals=int(os.environ.get("BENCH_PROPOSALS", "1")),
    )
    ctx = engine.make_context(data, cfg)
    state = engine.init_state(ctx, cfg)

    # warm up with the SAME program shape as the timed run (one compile).
    # 512 iterations measure the sustained steady-state rate: the sweep
    # schedule's partial re-cost and the converged parse shape both need
    # a few epochs to reach their operating point, and a real run is
    # 600n moves — the first few hundred iterations are noise there.
    iters = int(os.environ.get("BENCH_ITERS", "512"))
    state = engine.run_iters(state, ctx, cfg, iters)
    jax.block_until_ready(state)

    t0 = time.time()
    state = engine.run_iters(state, ctx, cfg, iters)
    jax.block_until_ready(state)
    dt = time.time() - t0

    moves = CHAINS * iters
    mps = moves / dt
    print(json.dumps({
        "metric": "anneal_moves_per_sec_per_chip",
        "value": round(mps, 1),
        "unit": "moves/s",
        "vs_baseline": round(mps / BASELINE_MOVES_PER_S, 3),
    }))
    # context for humans, stderr only
    sys.stderr.write(
        "n=%d chains=%d iters=%d dt=%.2fs best=%.2fB backend=%s\n" % (
            N, CHAINS, iters, dt, engine.best_cost_bytes(state),
            jax.default_backend(),
        )
    )


if __name__ == "__main__":
    main()
