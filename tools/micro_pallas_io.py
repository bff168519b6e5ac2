"""Micro: dynamic column slice [C,n] vs row+transpose [n,C]; SMEM scalar reads."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, N, ITERS = 256, 2048, 2048

def k_colslice(slab_ref, data_ref, cand_ref, out_ref):
    """per step: read col [C,1] at lane i, SMEM scalar, cand row; write col."""
    def body(i, acc):
        col = slab_ref[:, pl.ds(i, 1)]            # [C, 1] dynamic lane slice
        b = data_ref[i]                            # SMEM scalar
        row = cand_ref[pl.ds(i, 1), :]             # [1, 16] row read
        v = col + b + jnp.sum(row).astype(jnp.int32)
        out_ref[:, pl.ds(i, 1)] = v
        return acc + v[:, 0]
    out = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(C, jnp.int32))
    out_ref[:, 0] = out

def k_rowread(slabT_ref, data_ref, cand_ref, out_ref):
    """transposed: read row [1,C], transpose to [C,1], write back row."""
    def body(i, acc):
        row = slabT_ref[pl.ds(i, 1), :]            # [1, C]
        colT = jnp.transpose(row)                  # [C, 1]
        b = data_ref[i]
        crow = cand_ref[pl.ds(i, 1), :]
        v = colT + b + jnp.sum(crow).astype(jnp.int32)
        out_ref[pl.ds(i, 1), :] = jnp.transpose(v)
        return acc + v[:, 0]
    out = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(C, jnp.int32))
    out_ref[0, :] = out

def run(kern, shape, name):
    slab = jnp.asarray(np.random.randint(0, 100, shape), jnp.int32)
    data = jnp.asarray(np.random.randint(0, 256, (N,)), jnp.int32)
    cand = jnp.asarray(np.random.randint(0, 100, (N, 16)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        out = jax.block_until_ready(f(slab, data, cand))
        t0 = time.time(); out = jax.block_until_ready(f(slab, data, cand)); dt = time.time() - t0
        print(f"{name}: {dt/ITERS*1e6:.3f} us/step")
    except Exception as e:
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:200]}")

run(k_colslice, (C, N), "col-slice [C,n]")
run(k_rowread, (N, C), "row+transpose [n,C]")
