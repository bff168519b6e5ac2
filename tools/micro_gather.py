import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from megalania_tpu.ops import bitplan
from megalania_tpu.match.suffix import lce_jnp

C, P, B, N, NTAB = 256, 2688, 26, 2048, 2048
K = 17
probs = jnp.ones((C,P), jnp.int32)*1024
idx0 = jnp.asarray(np.random.randint(0, P, (C,B)), jnp.int32)
sparse = jnp.ones((K, NTAB), jnp.int32)
rank = jnp.asarray(np.random.permutation(NTAB).astype(np.int32))
data = jnp.asarray(np.random.randint(0,256,NTAB), jnp.int32)
log2 = jnp.asarray(np.arange(2048), jnp.int32)

def timed(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.time(); out = fn(*args); jax.block_until_ready(out)
    dt=time.time()-t0
    print(f"{name}: {dt*1e3:.1f}ms ({dt/N*1e6:.2f}us/step)", flush=True)

def scan(body):
    @jax.jit
    def run(p):
        def step(carry, i):
            return body(carry, i)
        return jax.lax.scan(step, p, jnp.arange(N))
    return run

# A: gather+scatter baseline (per-chain indices)
def A(p, i):
    ii = (idx0 + i) % P
    g = jnp.take_along_axis(p, ii, axis=1)
    p = jax.vmap(lambda row, jj, vv: row.at[jj].set(vv))(p, ii, g+1)
    return p, g.sum()
timed("A gather+scatter", scan(A), probs)

# B: + per-chain data gather (batched 1D gather by [C] indices)
def Bf(p, i):
    ii = (idx0 + i) % P
    byte = data[(ii[:,0]) % NTAB]          # [C] gather from [NTAB]
    g = jnp.take_along_axis(p, ii, axis=1) + byte[:,None]
    p = jax.vmap(lambda row, jj, vv: row.at[jj].set(vv))(p, ii, g)
    return p, g.sum()
timed("B +data-gather", scan(Bf), probs)

# C: + LCE queries (4 per chain)
def Cf(p, i):
    ii = (idx0 + i) % P
    a = jnp.broadcast_to(i % NTAB, (C,4))
    b = (ii[:, :4]) % NTAB
    l = jax.vmap(lambda aa, bb: lce_jnp(rank, sparse, NTAB, aa, bb))(a, b)
    g = jnp.take_along_axis(p, ii, axis=1) + l.sum(1, keepdims=True)
    p = jax.vmap(lambda row, jj, vv: row.at[jj].set(vv))(p, ii, g)
    return p, g.sum()
timed("C +lce", scan(Cf), probs)

# D: + make_bit_plan vmapped
def Df(p, i):
    ii = (idx0 + i) % P
    plan = jax.vmap(lambda ct: bitplan.make_bit_plan(
        ct % 4, ct % 64, 2 + ct % 200, ct % 12, jnp.zeros(4, jnp.int32),
        ct % 256, (ct+1) % 256))(ii[:,0])
    g = jnp.take_along_axis(p, plan.idx % P, axis=1)
    p = jax.vmap(lambda row, jj, vv: row.at[jj].set(vv))(p, plan.idx % P, g+1)
    return p, g.sum()
timed("D +bitplan", scan(Df), probs)
