"""Phase-timing tool: compile + run costs of each engine piece on TPU."""
import time, sys, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from megalania_tpu.anneal import engine
from megalania_tpu.anneal.config import AnnealConfig
from megalania_tpu.ops import repair_scan

C = int(sys.argv[1]) if len(sys.argv) > 1 else 256
cfg = AnnealConfig(chains=C)
data = open('SURVEY.md','rb').read()[:2048]

t=time.time(); ctx = engine.make_context(data, cfg); print('make_context %.1fs' % (time.time()-t), flush=True)

rc = jax.jit(jax.vmap(lambda slab, q, u: repair_scan.repair_cost(
    slab, q, u, ctx.data, ctx.rank, ctx.sparse, ctx.log2)))
from megalania_tpu.models import packets as P
slabs = jnp.broadcast_to(jnp.asarray(P.literal_slab(2048)), (C, 2048))
qs = jnp.zeros(C, jnp.int32); us = jnp.full(C, 99, jnp.int32)
t=time.time(); out = rc(slabs, qs, us); jax.block_until_ready(out); print('repair compile+run %.1fs' % (time.time()-t), flush=True)
t=time.time(); out = rc(slabs, qs, us); jax.block_until_ready(out); print('repair run %.3fs' % (time.time()-t), flush=True)

t=time.time(); state = engine.init_state(ctx, cfg); jax.block_until_ready(state); print('init_state %.1fs' % (time.time()-t), flush=True)
it = jax.jit(lambda s: engine.anneal_iteration(s, ctx, cfg))
t=time.time(); s2 = it(state); jax.block_until_ready(s2); print('iter compile+run %.1fs' % (time.time()-t), flush=True)
t=time.time(); s2 = it(s2); jax.block_until_ready(s2); print('iter run %.3fs' % (time.time()-t), flush=True)
