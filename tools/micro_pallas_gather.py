"""Micro-bench: per-lane dynamic gather variants inside a Pallas TPU kernel."""
import sys; sys.path.insert(0, "/root/repo")
import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, P, S, ITERS = 256, 2688, 26, 512

def k_taa_lane(tbl_ref, idx_ref, out_ref):
    """take_along_axis along lanes: tbl [C,P], idx [C,S] -> [C,S]."""
    def body(t, acc):
        g = jnp.take_along_axis(tbl_ref[:], (idx_ref[:] + t) % P, axis=1)
        return acc + jnp.sum(g, axis=1)
    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(C, jnp.int32))

def k_onehot(tbl_ref, idx_ref, out_ref):
    """compare-select gather: mask over full P per slot."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (C, P), 1)
    def body(t, acc):
        idx = (idx_ref[:] + t) % P
        tot = jnp.zeros(C, jnp.int32)
        for s in range(S):
            m = lanes == idx[:, s:s+1]
            tot = tot + jnp.sum(jnp.where(m, tbl_ref[:], 0), axis=1)
        return acc + tot
    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(C, jnp.int32))

def run(kern, name):
    tbl = jnp.asarray(np.random.randint(0, 2048, (C, P)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, P, (C, S)), jnp.int32)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        g = jax.jit(f)
        out = jax.block_until_ready(g(tbl, idx))
        t0 = time.time(); out = jax.block_until_ready(g(tbl, idx)); dt = time.time() - t0
        per = dt / ITERS * 1e6
        print(f"{name}: {dt*1e3:.2f} ms total, {per:.3f} us/step ({S} gathers of {P})")
    except Exception as e:
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:300]}")

if __name__ == "__main__":
    run(k_taa_lane, "take_along_axis(lane)")
    run(k_onehot, "onehot-compare")
