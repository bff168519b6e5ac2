"""Phase timing on chip: proposer vs fused kernel vs full iteration."""
import sys; sys.path.insert(0, "/root/repo")
import sys, time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import functools
from megalania_tpu.anneal import engine, moves
from megalania_tpu.anneal.config import AnnealConfig
from megalania_tpu.models import packets as P

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
C = int(sys.argv[2]) if len(sys.argv) > 2 else 512
cfg = AnnealConfig(chains=C, chain_block=C if C % 128 == 0 else 128)
data = open("SURVEY.md", "rb").read()[:N]
ctx = engine.make_context(data, cfg)
state = engine.init_state(ctx, cfg)
jax.block_until_ready(state)


def timeit(name, fn, *args, reps=16):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print("%-18s %8.2f ms  (%8.0f moves/s)" % (name, dt * 1e3, C / dt),
          flush=True)
    return out


ch = state.chains
q = jnp.where(ch.rec_live >= N, 0, ch.rec_live)
prop = jax.jit(lambda ch, q: jax.vmap(
    functools.partial(moves.propose, top_k=cfg.top_k),
    in_axes=(0, 0, 0, 0, 0, None, None, None, None, None, None, 0,
           None, None),
)(ch.slab, q, ch.rec_ctx, ch.rec_dists, ch.rank_probs, ctx.data,
  ctx.rank, ctx.sparse, ctx.cand_dist, ctx.cand_len, ctx.cand_count,
  ch.key, ctx.log2, ctx.f2p))
timeit("propose", prop, ch, q)

u = jnp.zeros(C, jnp.int32)
rep = jax.jit(lambda s, q, u: engine._repair_cost(s, q, u, ctx, cfg))
timeit("repair_cost", rep, ch.slab, q, u)

it = jax.jit(lambda s: engine.anneal_iteration(s, ctx, cfg))
timeit("full_iteration", it, state)
