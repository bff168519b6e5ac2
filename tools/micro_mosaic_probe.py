"""Probe which Mosaic vector idioms compile on the real chip.

Each case is a tiny standalone pallas_call; prints PASS/FAIL + error head.
Informs the pallas_repair kernel design (broadcast/select/gather idioms).
"""
import sys; sys.path.insert(0, "/root/repo")
import functools
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CB = 256


def run(name, kernel, out_shape, *args, **inspecs):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.block_until_ready(jax.jit(f)(*args))
        print(f"PASS {name}")
        return r
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {msg}")
        return None


a1 = jnp.ones((CB, 1), jnp.int32)
a4 = jnp.ones((CB, 4), jnp.int32)
a10 = jnp.ones((CB, 10), jnp.int32)
a128 = jnp.arange(CB * 128, dtype=jnp.int32).reshape(CB, 128)


# 1. where([CB,1] i1, [CB,4], [CB,4])
def k_where4(c_ref, a_ref, b_ref, o_ref):
    cond = c_ref[:] > 0
    o_ref[:] = jnp.where(cond, a_ref[:], b_ref[:])

run("where_i1_CB1_x_CB4", k_where4,
    jax.ShapeDtypeStruct((CB, 4), jnp.int32), a1, a4, a4)


# 2. selk arithmetic: b + (a-b)*ci with ci [CB,1] int32
def k_selk(c_ref, a_ref, b_ref, o_ref):
    ci = (c_ref[:] > 0).astype(jnp.int32)
    o_ref[:] = b_ref[:] + (a_ref[:] - b_ref[:]) * ci

run("selk_int_CB1_x_CB4", k_selk,
    jax.ShapeDtypeStruct((CB, 4), jnp.int32), a1, a4, a4)


# 3. where([CB,1] i1, [CB,10], [CB,10]) — the _make_plan pattern
def k_where10(c_ref, a_ref, b_ref, o_ref):
    cond = c_ref[:] > 0
    o_ref[:] = jnp.where(cond, a_ref[:], b_ref[:])

run("where_i1_CB1_x_CB10", k_where10,
    jax.ShapeDtypeStruct((CB, 10), jnp.int32), a1, a10, a10)


# 4. explicit broadcast_to of the i1 cond, then where
def k_bcast(c_ref, a_ref, b_ref, o_ref):
    cond = jnp.broadcast_to(c_ref[:] > 0, (CB, 4))
    o_ref[:] = jnp.where(cond, a_ref[:], b_ref[:])

run("bcast_i1_then_where_CB4", k_bcast,
    jax.ShapeDtypeStruct((CB, 4), jnp.int32), a1, a4, a4)


# 5. pure [CB,1] columns (expected baseline-safe)
def k_cols(c_ref, a_ref, o_ref):
    cond = c_ref[:] > 0
    o_ref[:] = jnp.where(cond, a_ref[:], a_ref[:] + 1)

run("where_i1_CB1_x_CB1", k_cols,
    jax.ShapeDtypeStruct((CB, 1), jnp.int32), a1, a1)


# 6. take_along_axis gather along lanes, 128-wide table
def k_gather(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

idx128 = jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32)[None, :],
                          (CB, 128)) % 128
run("take_along_axis_CB128", k_gather,
    jax.ShapeDtypeStruct((CB, 128), jnp.int32), a128, idx128)


# 6b. gather with [CB, 32] indices from [CB, 128] table
def k_gather32(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

idx32 = jnp.broadcast_to(jnp.arange(32, dtype=jnp.int32)[None, :], (CB, 32))
run("take_along_axis_CB128_idx32", k_gather32,
    jax.ShapeDtypeStruct((CB, 32), jnp.int32), a128, idx32)


# 7. dynamic row read: tab[pl.ds(i,1), :] with traced i (SMEM scalar)
def k_dynrow(s_ref, t_ref, o_ref):
    i = s_ref[0]
    o_ref[:] = t_ref[pl.ds(i, 1), :]

try:
    f = pl.pallas_call(
        k_dynrow,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jax.block_until_ready(jax.jit(f)(jnp.array([3], jnp.int32), a128))
    print("PASS dynamic_row_read")
except Exception as e:
    print(f"FAIL dynamic_row_read: {str(e).splitlines()[0][:160]}")


# 8. masked-sum gather baseline (the round-1 idiom) for cost comparison
def k_masked(t_ref, i_ref, o_ref):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (CB, 128), 1)
    idx = i_ref[:]
    o_ref[:] = jnp.sum(jnp.where(lanes == idx, t_ref[:], 0), axis=1,
                       keepdims=True)

run("masked_sum_gather_CB1", k_masked,
    jax.ShapeDtypeStruct((CB, 1), jnp.int32), a128, a1)


# 9. roll-based broadcast of lane 0..3 cols — transpose [1,CB] <-> [CB,1]
def k_transpose(t_ref, o_ref):
    o_ref[:] = jnp.transpose(t_ref[0:1, :])

run("transpose_1xCB_to_CBx1", k_transpose,
    jax.ShapeDtypeStruct((CB, 1), jnp.int32),
    jnp.ones((8, CB), jnp.int32))

print("probe done; backend =", jax.default_backend())
