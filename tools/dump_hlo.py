import numpy as np, jax, jax.numpy as jnp, collections, re, sys
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from megalania_tpu.ops import scan_cost, tables as T
from megalania_tpu.models import packets as P
C, N = 256, 2048
data = jnp.asarray(np.zeros(N, np.int32))
slabs = jnp.broadcast_to(jnp.asarray(P.literal_slab(N)), (C, N))
log2 = jnp.asarray(T.LOG2_TABLE_I32)
fn = jax.jit(jax.vmap(lambda s: scan_cost.parse_cost(s, data, log2)))
txt = fn.lower(slabs).compile().as_text()
print("total lines", len(txt.splitlines()))
# count top-level ops in the while body computation
m = re.findall(r'ENTRY|while|fusion|gather|scatter|dynamic-slice|dynamic-update-slice|all-reduce|copy\(', txt)
print(collections.Counter(m))
# find body computation names
bodies = re.findall(r'%(\S*body\S*) \(', txt)
print("bodies:", set(bodies))
open('/tmp/hlo.txt','w').write(txt)
