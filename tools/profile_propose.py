"""Sub-phase timing of moves.propose on chip: enumerate vs rank vs rest."""
import sys; sys.path.insert(0, "/root/repo")
import functools
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from megalania_tpu.anneal import engine, moves
from megalania_tpu.anneal.config import AnnealConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
C = int(sys.argv[2]) if len(sys.argv) > 2 else 512
cfg = AnnealConfig(chains=C, chain_block=C if C % 128 == 0 else 128)
data = open("SURVEY.md", "rb").read()[:N]
ctx = engine.make_context(data, cfg)
state = engine.init_state(ctx, cfg)
jax.block_until_ready(state)
ch = state.chains
q = jnp.where(ch.rec_live >= N, 0, ch.rec_live)


def timeit(name, fn, *args, reps=16):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print("%-12s %7.2f ms" % (name, (time.time() - t0) / reps * 1e3),
          flush=True)


gath = jax.jit(lambda q, rd: jax.vmap(
    lambda qq, rr: moves.gather_candidates(
        qq, rr, ctx.data, ctx.rank, ctx.sparse, ctx.cand_dist,
        ctx.cand_len, ctx.cand_count))(q, rd))
timeit("enumerate", gath, q, ch.rec_dists)

cands = gath(q, ch.rec_dists)


def rank_all(cands, rp, rc, rd, q):
    byte = ctx.data[q]
    mb = ctx.data[jnp.clip(q - rd[0] - 1, 0, N - 1)]
    return moves.rank_candidates(cands, rp, rc, rd, byte, mb, ctx.log2, ctx.f2p)


rank = jax.jit(lambda cands, rp, rc, rd, q: jax.vmap(rank_all)(
    cands, rp, rc, rd, q))
timeit("rank", rank, cands, ch.rank_probs, ch.rec_ctx, ch.rec_dists, q)

metric = rank(cands, ch.rank_probs, ch.rec_ctx, ch.rec_dists, q)
choice = jax.jit(lambda m, v, k: jax.vmap(
    lambda mm, vv, kk: moves.biased_topk_choice(mm, vv, cfg.top_k, kk))(
        m, v, k))
timeit("choice", choice, metric, cands.valid, ch.key)

prop = jax.jit(lambda: jax.vmap(
    functools.partial(moves.propose, top_k=cfg.top_k),
    in_axes=(0, 0, 0, 0, 0, None, None, None, None, None, None, 0,
           None, None),
)(ch.slab, q, ch.rec_ctx, ch.rec_dists, ch.rank_probs, ctx.data,
  ctx.rank, ctx.sparse, ctx.cand_dist, ctx.cand_len, ctx.cand_count,
  ch.key, ctx.log2, ctx.f2p))
timeit("propose_all", prop)
