import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
C, P, B, N = 256, 2688, 26, 2048
probs = jnp.ones((C,P), jnp.int32)*1024
idx = jnp.asarray(np.random.randint(0, P, (C,B)), jnp.int32)
def timed(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.time(); out = fn(*args); jax.block_until_ready(out)
    dt=time.time()-t0
    print(f"{name}: {dt*1e3:.1f}ms ({dt/N*1e6:.2f}us/step)", flush=True)
for unroll in (1, 4, 16):
    @jax.jit
    def gs(probs, idx, unroll=unroll):
        def step(p, i):
            ii = (idx + i) % P
            g = jnp.take_along_axis(p, ii, axis=1)
            p = jax.vmap(lambda row, jj, vv: row.at[jj].set(vv))(p, ii, g+1)
            return p, g.sum()
        return jax.lax.scan(step, probs, jnp.arange(N), unroll=unroll)
    timed(f"unroll={unroll}", gs, probs, idx)
