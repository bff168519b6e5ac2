"""Steady-state moves/s at the n=65536 design point for one config.

Round-4 throughput probe (VERDICT r3 item 2): measures engine.run_iters
at n=64Ki for a (chains, chain_block, tile, proposals) combination set
via env/argv, so (cb, tile) tradeoffs can be mapped on the real chip.

Usage: [MEGALANIA_TILE=..] python tools/probe_64k_rate.py [chains] [cb]
                                [iters] [proposals]
"""
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from megalania_tpu.anneal import engine
from megalania_tpu.anneal.config import AnnealConfig
from megalania_tpu.ops import pallas_repair2 as PR2

N = 1 << 16
CHAINS = int(sys.argv[1]) if len(sys.argv) > 1 else 256
CB = int(sys.argv[2]) if len(sys.argv) > 2 else min(CHAINS, 256)
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 0   # 0 = one sweep
PROPS = int(sys.argv[4]) if len(sys.argv) > 4 else 1


def main():
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    raw = open(_os.path.join(repo, "SURVEY.md"), "rb").read()
    data = (raw * (N // len(raw) + 1))[:N]
    cfg = AnnealConfig(chains=CHAINS, chain_block=CB, proposals=PROPS)
    tile = PR2.choose_tile(N, CB)
    # FAIR steady-state window: a whole number of sweep cycles, so the
    # average walk length (start stratum -> n) is identical across tile
    # sizes — a partial cycle over-samples whichever strata it lands on.
    sweep_len = (-(-N // tile)) * cfg.sweep_repeats
    iters = ITERS or sweep_len
    ctx = engine.make_context(data, cfg)
    state = engine.init_state(ctx, cfg)
    t0 = time.time()
    state = engine.run_iters(state, ctx, cfg, iters)
    jax.block_until_ready(state)
    warm = time.time() - t0
    t0 = time.time()
    state = engine.run_iters(state, ctx, cfg, iters)
    jax.block_until_ready(state)
    dt = time.time() - t0
    moves = CHAINS * PROPS * iters
    print(json.dumps({
        "n": N, "chains": CHAINS, "cb": CB, "tile": tile,
        "proposals": PROPS, "iters": iters,
        "warm_s": round(warm, 1), "dt": round(dt, 2),
        "moves_per_s": round(moves / dt, 1),
        "best_bytes": round(engine.best_cost_bytes(state), 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
