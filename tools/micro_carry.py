import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from megalania_tpu.models import packets as P

C, Pn, B, N = 256, 2688, 26, 2048
probs = jnp.ones((C,Pn), jnp.int32)*1024
slab_nc = jnp.transpose(jnp.broadcast_to(jnp.asarray(P.literal_slab(N)), (C, N))) + 0
data = jnp.asarray(np.random.randint(0,256,N), jnp.int32)

def timed(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.time(); out = fn(*args); jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)*1e3:.1f}ms", flush=True)

# W5: data threaded through the carry; per-chain gather from it
@jax.jit
def w5(p, slab_nc, data):
    def step(carry, xs):
        i, entry = xs
        p, acc, d = carry
        ptype, dist, length, _ = P.unpack(entry)
        mb = d[jnp.clip(i - dist - 1, 0, N-1)]
        byte = d[i]
        ii = (dist[:,None]*7 + mb[:,None] + byte + jnp.arange(B)) % Pn
        g = jnp.take_along_axis(p, ii, axis=1)
        p = jax.vmap(lambda r,j,v: r.at[j].set(v))(p, ii, g+1)
        return (p, acc + g.sum(1), d), ()
    return jax.lax.scan(step, (p, jnp.zeros(C, jnp.int32), data),
                        (jnp.arange(N), slab_nc))
timed("W5 data-in-carry", w5, probs, slab_nc, data)

# W6: byte via xs (prealigned), mb via carry-gather
@jax.jit
def w6(p, slab_nc, data):
    def step(carry, xs):
        entry, byte, i = xs
        p, acc, d = carry
        ptype, dist, length, _ = P.unpack(entry)
        mb = d[jnp.clip(i - dist - 1, 0, N-1)]
        ii = (dist[:,None]*7 + mb[:,None] + byte + jnp.arange(B)) % Pn
        g = jnp.take_along_axis(p, ii, axis=1)
        p = jax.vmap(lambda r,j,v: r.at[j].set(v))(p, ii, g+1)
        return (p, acc + g.sum(1), d), ()
    return jax.lax.scan(step, (p, jnp.zeros(C, jnp.int32), data),
                        (slab_nc, data, jnp.arange(N)))
timed("W6 byte-via-xs mb-carry", w6, probs, slab_nc, data)
