import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from megalania_tpu.models import packets as P

C, Pn, B, N = 256, 2688, 26, 2048
probs = jnp.ones((C,Pn), jnp.int32)*1024
slab_cn = jnp.broadcast_to(jnp.asarray(P.literal_slab(N)), (C, N)) + 0
slab_nc = jnp.transpose(slab_cn) + 0
data = jnp.asarray(np.random.randint(0,256,N), jnp.int32)

def timed(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.time(); out = fn(*args); jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)*1e3:.1f}ms", flush=True)

# W1: entries via xs [N, C]
@jax.jit
def w1(p, slab_nc):
    def step(carry, entry):
        p, acc = carry
        ptype, dist, length, _ = P.unpack(entry)
        ii = (dist[:,None]*7 + length[:,None]*13 + jnp.arange(B)) % Pn
        g = jnp.take_along_axis(p, ii, axis=1)
        p = jax.vmap(lambda r,j,v: r.at[j].set(v))(p, ii, g+1)
        return (p, acc + g.sum(1)), ()
    return jax.lax.scan(step, (p, jnp.zeros(C, jnp.int32)), slab_nc)
timed("W1 xs-entries", w1, probs, slab_nc)

# W2: same + data[i] scalar dynamic index (closure const data)
@jax.jit
def w2(p, slab_nc):
    def step(carry, xs):
        i, entry = xs
        p, acc = carry
        ptype, dist, length, _ = P.unpack(entry)
        byte = data[i]
        ii = (dist[:,None]*7 + byte + jnp.arange(B)) % Pn
        g = jnp.take_along_axis(p, ii, axis=1)
        p = jax.vmap(lambda r,j,v: r.at[j].set(v))(p, ii, g+1)
        return (p, acc + g.sum(1)), ()
    return jax.lax.scan(step, (p, jnp.zeros(C, jnp.int32)), (jnp.arange(N), slab_nc))
timed("W2 +data[i]", w2, probs, slab_nc)

# W3: same + per-chain gather data[clip(i-dist-1)]
@jax.jit
def w3(p, slab_nc):
    def step(carry, xs):
        i, entry = xs
        p, acc = carry
        ptype, dist, length, _ = P.unpack(entry)
        mb = data[jnp.clip(i - dist - 1, 0, N-1)]
        ii = (dist[:,None]*7 + mb[:,None] + jnp.arange(B)) % Pn
        g = jnp.take_along_axis(p, ii, axis=1)
        p = jax.vmap(lambda r,j,v: r.at[j].set(v))(p, ii, g+1)
        return (p, acc + g.sum(1)), ()
    return jax.lax.scan(step, (p, jnp.zeros(C, jnp.int32)), (jnp.arange(N), slab_nc))
timed("W3 +mb gather", w3, probs, slab_nc)

# W4: data passed as ARG not closure
@jax.jit
def w4(p, slab_nc, data):
    def step(carry, xs):
        i, entry = xs
        p, acc = carry
        ptype, dist, length, _ = P.unpack(entry)
        mb = data[jnp.clip(i - dist - 1, 0, N-1)]
        ii = (dist[:,None]*7 + mb[:,None] + jnp.arange(B)) % Pn
        g = jnp.take_along_axis(p, ii, axis=1)
        p = jax.vmap(lambda r,j,v: r.at[j].set(v))(p, ii, g+1)
        return (p, acc + g.sum(1)), ()
    return jax.lax.scan(step, (p, jnp.zeros(C, jnp.int32)), (jnp.arange(N), slab_nc))
timed("W4 mb-gather data-as-arg", w4, probs, slab_nc, data)
