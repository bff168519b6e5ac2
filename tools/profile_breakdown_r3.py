"""Per-stage timing at n=2048 C=512 on the real chip (round 3).

Times: fused repair kernel (full walk vs partial start), rank kernel,
full engine iteration.  Guides round-3 optimization targets.
"""
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from megalania_tpu.anneal import engine, moves
from megalania_tpu.anneal.config import AnnealConfig
from megalania_tpu.models import packets as P
from megalania_tpu.ops import pallas_repair2 as PR2, pallas_rank

import os
N = int(os.environ.get("PN", "2048")); C = int(os.environ.get("PC", "512"))
repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
raw = open(_os.path.join(repo, "SURVEY.md"), "rb").read()
data = (raw * (N // len(raw) + 1))[:N]
CB = int(os.environ.get("PCB", "512"))
cfg = AnnealConfig(chains=C, chain_block=CB)
ctx = engine.make_context(data, cfg)
state = engine.init_state(ctx, cfg)
ch = state.chains
corr = ctx.corr
tile = PR2.choose_tile(N, CB)
n_tiles = -(-N // tile)

def timeit(name, f, iters=30):
    f()  # compile
    jax.block_until_ready(f())
    t0 = time.time()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms")
    return dt

q = jnp.full(C, 64, jnp.int32)
u = jnp.full(C, 1024, jnp.int32)

f_full = jax.jit(lambda s: PR2.repair_cost_pallas2(
    s, q, u, ctx.data, ctx.data_packed, ctx.cand_dist, ctx.cand_len,
    corr, cb=CB))
timeit("repair full walk (8 tiles)", lambda: f_full(ch.slab))

for st in (n_tiles // 4, n_tiles // 2, 3 * n_tiles // 4):
    fp_ = jax.jit(lambda s, stt=st: PR2.repair_cost_pallas2(
        s, jnp.full(C, stt * tile, jnp.int32), u, ctx.data,
        ctx.data_packed, ctx.cand_dist, ctx.cand_len, corr, cb=CB,
        start_tile=jnp.int32(stt), cap_tile=jnp.int32(stt),
        probs_in=ch.rank_probs, carry_in=ch.snap_carry))
    timeit(f"repair start tile {st}/{n_tiles}", lambda: fp_(ch.slab))

# rank kernel
cands = jax.vmap(
    lambda s, qq, rd: moves.enumerate_candidates(
        s, qq, rd, ctx.data, ctx.rank, ctx.sparse, ctx.cand_dist,
        ctx.cand_len, ctx.cand_count))(ch.slab, q, ch.rec_dists)
candp = P.pack(cands.ptype, cands.dist, cands.length,
               cands.valid.astype(jnp.int32))
mb = ctx.data[jnp.clip(q - ch.rec_dists[:, 0] - 1, 0, N - 1)]
f_rank = jax.jit(lambda rp: pallas_rank.rank_pallas(
    rp, candp, ch.rec_ctx, ch.rec_dists, ctx.data[q], mb,
    ctx.log2, ctx.f2p, corr, cb=CB))
print("NC =", candp.shape[1])
timeit("rank kernel", lambda: f_rank(ch.rank_probs))

# enumerate alone
f_enum = jax.jit(lambda s: jax.vmap(
    lambda ss, qq, rd: moves.enumerate_candidates(
        ss, qq, rd, ctx.data, ctx.rank, ctx.sparse, ctx.cand_dist,
        ctx.cand_len, ctx.cand_count))(s, q, ch.rec_dists))
timeit("enumerate", lambda: f_enum(ch.slab))

# full engine iteration
f_it = jax.jit(lambda s: engine.run_iters(s, ctx, cfg, 8))
timeit("engine 8 iters", lambda: f_it(state), iters=5)
