"""Scaling of the synthetic packet-step with C (chains) and S (slots)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, ITERS = 2688, 256

def mk_kernel(C, S):
    def kern(tbl_ref, idx_ref, out_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (C, P), 1)
        def body(t, carry):
            acc, tbl = carry
            idx = (idx_ref[:] + t) % P
            bits = (idx ^ t) & 1
            cost = jnp.zeros(C, jnp.int32)
            newtbl = tbl
            for s in range(S):
                m = lanes == idx[:, s:s+1]
                p = jnp.sum(jnp.where(m, newtbl, 0), axis=1)
                cost = cost + jnp.where(bits[:, s] == 1, 2048 - p, p)
                adapted = jnp.where(bits[:, s] == 1, p - (p >> 5),
                                    p + ((2048 - p) >> 5))
                newtbl = jnp.where(m, adapted[:, None], newtbl)
            return (acc + cost, newtbl)
        acc, tbl = jax.lax.fori_loop(0, ITERS, body,
                                     (jnp.zeros(C, jnp.int32), tbl_ref[:]))
        out_ref[:] = acc + tbl[:, 0]
    return kern

def run(C, S):
    tbl = jnp.asarray(np.random.randint(0, 2048, (C, P)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, P, (C, S)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        mk_kernel(C, S),
        out_shape=jax.ShapeDtypeStruct((C,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        out = jax.block_until_ready(f(tbl, idx))
        t0 = time.time(); out = jax.block_until_ready(f(tbl, idx)); dt = time.time() - t0
        per = dt / ITERS * 1e6
        print(f"C={C} S={S}: {per:.3f} us/step, {C/(per*1e-6*2048)/1e3:.1f}k moves/s-est")
    except Exception as e:
        print(f"C={C} S={S}: FAILED: {type(e).__name__}: {str(e)[:120]}")

for C, S in ((64, 26), (128, 26), (256, 26), (384, 26), (512, 26), (256, 13), (256, 52)):
    run(C, S)
