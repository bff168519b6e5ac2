"""Does TPU f32 log2 reproduce the exact LOG2 table? (per-value check)"""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from megalania_tpu.ops import tables as T

i = jnp.arange(1, 2048, dtype=jnp.int32)
@jax.jit
def f(i):
    x = i.astype(jnp.float32) * jnp.float32(1.0 / 2048.0)
    return jnp.trunc(-jnp.log2(x) * jnp.float32(2048.0)).astype(jnp.int32)
v = np.asarray(f(i))
tab = T.LOG2_TABLE_NP[1:].astype(np.int32)
mism = np.nonzero(v != tab)[0]
print("tpu f32 mismatches:", len(mism))
if len(mism): print((mism+1)[:30], v[mism[:30]], tab[mism[:30]])
