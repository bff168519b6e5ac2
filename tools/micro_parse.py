import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from megalania_tpu.ops import scan_cost, tables as T
from megalania_tpu.models import packets as P

C, N = 256, 2048
data = jnp.asarray(np.frombuffer(open('SURVEY.md','rb').read()[:N], np.uint8).astype(np.int32))
slabs = jnp.broadcast_to(jnp.asarray(P.literal_slab(N)), (C, N))
log2 = jnp.asarray(T.LOG2_TABLE_I32)

fn = jax.jit(jax.vmap(lambda s: scan_cost.parse_cost(s, data, log2)))
out = fn(slabs); jax.block_until_ready(out)
t0=time.time(); out = fn(slabs); jax.block_until_ready(out); dt=time.time()-t0
print(f"parse_cost x{C}: {dt*1e3:.1f}ms ({dt/N*1e6:.2f}us/step)")
