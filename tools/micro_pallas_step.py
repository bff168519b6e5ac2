"""Micro-bench: synthetic full packet-step (gather+log2+adapt+scatter) in Pallas."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, S, ITERS = 2688, 26, 256

def mk_kernel(C):
    def kern(tbl_ref, idx_ref, corr_ref, out_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (C, P), 1)
        def body(t, carry):
            acc, tbl = carry
            idx = (idx_ref[:] + t) % P
            bits = (idx ^ t) & 1
            cost = jnp.zeros(C, jnp.int32)
            newtbl = tbl
            for s in range(S):
                m = lanes == idx[:, s:s+1]
                p = jnp.sum(jnp.where(m, newtbl, 0), axis=1)          # gather
                pc = jnp.where(bits[:, s] == 1, 2048 - p, p)
                # exact log2: f32 + packed correction gather (128-wide)
                x = pc.astype(jnp.float32) * jnp.float32(1.0 / 2048.0)
                c32 = jnp.trunc(-jnp.log2(jnp.maximum(x, 1e-9)) * 2048.0).astype(jnp.int32)
                w = jnp.sum(jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1) == (pc >> 4)[:, None],
                    corr_ref[:], 0), axis=1)
                corr = ((w >> ((pc & 15) * 2)) & 3) - 1
                cost = cost + c32 + corr
                adapted = jnp.where(bits[:, s] == 1, p - (p >> 5),
                                    p + ((2048 - p) >> 5))
                newtbl = jnp.where(m, adapted[:, None], newtbl)       # scatter
            return (acc + cost, newtbl)
        acc, tbl = jax.lax.fori_loop(
            0, ITERS, body,
            (jnp.zeros(C, jnp.int32), tbl_ref[:]))
        out_ref[:] = acc + tbl[:, 0]
    return kern

def run(C):
    tbl = jnp.asarray(np.random.randint(0, 2048, (C, P)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, P, (C, S)), jnp.int32)
    corr = jnp.asarray(np.random.randint(0, 2**30, (C, 128)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        mk_kernel(C),
        out_shape=jax.ShapeDtypeStruct((C,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        out = jax.block_until_ready(f(tbl, idx, corr))
        t0 = time.time(); out = jax.block_until_ready(f(tbl, idx, corr)); dt = time.time() - t0
        per = dt / ITERS * 1e6
        mps = C / (per * 1e-6 * 2048)  # moves/s if one move = 2048 such steps
        print(f"C={C}: {per:.3f} us/step -> est {mps/1e3:.1f}k moves/s (n=2048)")
    except Exception as e:
        print(f"C={C}: FAILED: {type(e).__name__}: {str(e)[:200]}")

for C in (256, 512, 1024):
    run(C)
