"""Time the fused Pallas repair+cost kernel alone, at several chain counts."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from megalania_tpu.anneal import engine
from megalania_tpu.anneal.config import AnnealConfig
from megalania_tpu.models import packets as P
from megalania_tpu.ops import pallas_repair

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
data = open('SURVEY.md', 'rb').read()[:N]

cfg = AnnealConfig(chains=8)
ctx = engine.make_context(data, cfg)

for C in (64, 256, 512):
    slabs = jnp.broadcast_to(jnp.asarray(P.literal_slab(N)), (C, N))
    q = jnp.zeros(C, jnp.int32)
    u = jnp.full(C, 99, jnp.int32)
    f = jax.jit(lambda s, q, u: pallas_repair.repair_cost_pallas(
        s, q, u, ctx.data, ctx.data_packed, ctx.cand_dist, ctx.cand_len,
        ctx.corr, cb=min(256, C)))
    t = time.time()
    out = f(slabs, q, u)
    jax.block_until_ready(out)
    print(f"C={C} compile+run {time.time()-t:.2f}s", flush=True)
    t = time.time()
    reps = 3
    for _ in range(reps):
        out = f(slabs, q, u)
    jax.block_until_ready(out)
    dt = (time.time() - t) / reps
    print(f"C={C} run {dt*1e3:.1f}ms  ({C/dt:.0f} moves/s)", flush=True)
