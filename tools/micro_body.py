import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from megalania_tpu.models import packets as P
from megalania_tpu.models import lzma_state as S

C, Pn, B, N = 256, 2688, 26, 2048
probs = jnp.ones((C,Pn), jnp.int32)*1024
slab = jnp.broadcast_to(jnp.asarray(P.literal_slab(N)), (C, N))
data = jnp.asarray(np.random.randint(0,256,N), jnp.int32)
log2t = jnp.asarray(np.arange(2048), jnp.int32)

def timed(name, mk):
    fn = jax.jit(mk)
    out = fn(probs); jax.block_until_ready(out)
    t0=time.time(); out = fn(probs); jax.block_until_ready(out)
    dt=time.time()-t0
    print(f"{name}: {dt*1e3:.1f}ms ({dt/N*1e6:.2f}us/step)", flush=True)

def scan_over(body):
    def run(p):
        def step(carry, i):
            return body(carry, i)
        return jax.lax.scan(step, (p, jnp.zeros(C, jnp.int32)), jnp.arange(N))
    return run

# V0: unpack + simple idx from entry + gather/scatter
def v0(carry, i):
    p, acc = carry
    ptype, dist, length, _ = P.unpack(slab[:, i])
    ii = (dist[:,None]*7 + length[:,None]*13 + jnp.arange(B)) % Pn
    g = jnp.take_along_axis(p, ii, axis=1)
    p = jax.vmap(lambda r,j,v: r.at[j].set(v))(p, ii, g+1)
    return (p, acc + g.sum(1)), ()
timed("V0 unpack+gs", scan_over(v0))

# V1: + log2 gather + adapt + masks
def v1(carry, i):
    p, acc = carry
    ptype, dist, length, _ = P.unpack(slab[:, i])
    ii = (dist[:,None]*7 + length[:,None]*13 + jnp.arange(B)) % Pn
    bit = (dist[:,None] >> jnp.arange(B)) & 1
    act = (length[:,None] + jnp.arange(B)) % 3 < 2
    g = jnp.take_along_axis(p, ii, axis=1)
    c = log2t[jnp.where(bit==1, 2048-g, g) % 2048]
    newp = jnp.where(bit==1, g-(g>>5), g+((2048-g)>>5))
    p = jax.vmap(lambda r,j,v: r.at[j].set(v))(p, ii, jnp.where(act, newp, g))
    return (p, acc + jnp.where(act, c, 0).sum(1)), ()
timed("V1 +log2+adapt", scan_over(v1))

# V2: + per-chain data gathers (dyn idx from carry-ish values)
def v2(carry, i):
    p, acc = carry
    ptype, dist, length, _ = P.unpack(slab[:, i])
    mb = data[jnp.clip(i - dist - 1, 0, N-1)]
    byte = data[i]
    ii = (dist[:,None]*7 + mb[:,None] + byte + jnp.arange(B)) % Pn
    g = jnp.take_along_axis(p, ii, axis=1)
    p = jax.vmap(lambda r,j,v: r.at[j].set(v))(p, ii, g+1)
    return (p, acc + g.sum(1)), ()
timed("V2 +data-gathers", scan_over(v2))

# V3: + literal block (cumprod) and tree_rev style [B,B] math
def v3(carry, i):
    p, acc = carry
    ptype, dist, length, _ = P.unpack(slab[:, i])
    byte = data[i]; mb = data[jnp.clip(i - dist - 1, 0, N-1)]
    j8 = jnp.arange(8)
    lbits = (byte >> (7-j8)) & 1
    mbits = (mb[:,None] >> (7-j8)) & 1
    eq = (lbits[None,:] == mbits).astype(jnp.int32)
    pre = jnp.concatenate([jnp.ones((C,1),jnp.int32), jnp.cumprod(eq, 1)[:, :7]], 1)
    j5 = jnp.arange(5)
    sh = j5[:,None] - 1 - j5[None,:]
    vbits = (dist[:,None] >> j5) & 1
    rev = jnp.sum(jnp.where(sh[None]>=0, vbits[:,None,:] << jnp.maximum(sh,0)[None], 0), 2)
    ii = (pre.sum(1)[:,None] + rev.sum(1)[:,None] + jnp.arange(B)) % Pn
    g = jnp.take_along_axis(p, ii, axis=1)
    p = jax.vmap(lambda r,j,v: r.at[j].set(v))(p, ii, g+1)
    return (p, acc + g.sum(1)), ()
timed("V3 +literal+rev", scan_over(v3))

# V4: + dists_next-style dynamic stack ops on [C,4]
dists0 = jnp.zeros((C,4), jnp.int32)
def v4(carry, i):
    p, acc = carry
    ptype, dist, length, _ = P.unpack(slab[:, i])
    d = dists0 + dist[:,None]
    nd = jax.vmap(S.dists_next)(d, ptype, dist)
    ii = (nd.sum(1)[:,None] + jnp.arange(B)) % Pn
    g = jnp.take_along_axis(p, ii, axis=1)
    p = jax.vmap(lambda r,j,v: r.at[j].set(v))(p, ii, g+1)
    return (p, acc + g.sum(1)), ()
timed("V4 +dists_next", scan_over(v4))
