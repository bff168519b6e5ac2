"""Probe the Mosaic idioms kernel v2 (class-decomposed probs) relies on.

v2 layout: per-chain values ride [1, CB] (chains on lanes); prob classes
are [R, CB] scratch (class row on sublanes).  Checks: sublane-broadcast
compare, masked row-sum reduce, scratch read-modify-write, take_along on
multi-column [1, CB] vectors, dynamic scratch row read/write, [1,M]
transpose, variable shifts.
"""
import sys; sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CB = 256
R = 16


def run(name, kernel, out_shape, args, in_spaces=None, scratch=()):
    try:
        n = len(args)
        spaces = in_spaces or [pltpu.VMEM] * n
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=s) for s in spaces],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch),
        )
        r = jax.block_until_ready(jax.jit(f)(*args))
        print(f"PASS {name}")
        return r
    except Exception as e:
        print(f"FAIL {name}: {str(e).splitlines()[0][:150]}")
        return None


tab = jnp.arange(R * CB, dtype=jnp.int32).reshape(R, CB)
idx = (jnp.arange(CB, dtype=jnp.int32)[None, :] * 7) % R    # [1, CB]
val = jnp.ones((1, CB), jnp.int32)


# 1. class gather: [R,CB] masked row-sum with [1,CB] idx broadcast
def k_clsg(t_ref, i_ref, o_ref):
    riota = jax.lax.broadcasted_iota(jnp.int32, (R, CB), 0)
    m = riota == i_ref[:]
    o_ref[:] = jnp.sum(jnp.where(m, t_ref[:], 0), axis=0, keepdims=True)

run("cls_gather_rowsum", k_clsg,
    jax.ShapeDtypeStruct((1, CB), jnp.int32), (tab, idx))


# 2. class scatter: write where(m & act, adapted, t) into scratch, then out
def k_clss(t_ref, i_ref, a_ref, o_ref, s_ref):
    s_ref[:] = t_ref[:]
    riota = jax.lax.broadcasted_iota(jnp.int32, (R, CB), 0)
    m = riota == i_ref[:]
    act = a_ref[:] > 0
    s_ref[:] = jnp.where(m & act, a_ref[:] + 5, s_ref[:])
    o_ref[:] = s_ref[:]

run("cls_scatter_scratch", k_clss,
    jax.ShapeDtypeStruct((R, CB), jnp.int32), (tab, idx, val),
    scratch=(pltpu.VMEM((R, CB), jnp.int32),))


# 3. take_along_axis on [1, CB] (CB=256: two lane columns)
def k_ta(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

t1 = jnp.arange(CB, dtype=jnp.int32)[None, :]
i_local = ((jnp.arange(CB, dtype=jnp.int32) * 13) % 128
           + (jnp.arange(CB, dtype=jnp.int32) & ~127))[None, :]
run("take_along_1xCB_vreglocal", k_ta,
    jax.ShapeDtypeStruct((1, CB), jnp.int32), (t1, i_local))

i_global = ((jnp.arange(CB, dtype=jnp.int32) * 13) % CB)[None, :]
r = run("take_along_1xCB_global", k_ta,
        jax.ShapeDtypeStruct((1, CB), jnp.int32), (t1, i_global))
if r is not None:
    import numpy as np
    want = np.asarray(t1)[0][np.asarray(i_global)[0]]
    print("   global semantics:", "OK" if (np.asarray(r)[0] == want).all()
          else "WRONG (vreg-local)")


# 4. take_along on [8, CB]
def k_ta8(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

t8 = jnp.broadcast_to(t1, (8, CB))
i8 = jnp.broadcast_to(i_local, (8, CB))
run("take_along_8xCB_vreglocal", k_ta8,
    jax.ShapeDtypeStruct((8, CB), jnp.int32), (t8, i8))


# 5. dynamic scratch row read/write with traced scalar row
def k_dynrw(s_ref, t_ref, o_ref, lit_ref):
    lit_ref[:] = t_ref[:]
    r0 = s_ref[0]
    row = lit_ref[pl.ds(r0, 1), :]
    lit_ref[pl.ds(r0, 1), :] = row + 1
    o_ref[:] = lit_ref[pl.ds(r0, 1), :]

run("dyn_scratch_row_rw", k_dynrw,
    jax.ShapeDtypeStruct((1, CB), jnp.int32),
    (jnp.array([5], jnp.int32), tab),
    in_spaces=[pltpu.SMEM, pltpu.VMEM],
    scratch=(pltpu.VMEM((R, CB), jnp.int32),))


# 6. [1,16] -> [16,1] transpose
def k_tr(t_ref, o_ref):
    o_ref[:] = jnp.transpose(t_ref[0:1, :16])

run("transpose_1x16_to_16x1", k_tr,
    jax.ShapeDtypeStruct((16, 1), jnp.int32), (t1,))


# 7. variable per-lane shifts on [1,CB]
def k_shift(a_ref, b_ref, o_ref):
    o_ref[:] = (a_ref[:] >> (b_ref[:] & 7)) | (a_ref[:] << (b_ref[:] & 3))

run("variable_shifts", k_shift,
    jax.ShapeDtypeStruct((1, CB), jnp.int32), (t1, i_global))


# 8. fori_loop with ~12 [1,CB] carries + scratch class ops inside
def k_loop(t_ref, i_ref, o_ref, s_ref):
    s_ref[:] = t_ref[:]
    riota = jax.lax.broadcasted_iota(jnp.int32, (R, CB), 0)

    def body(k, carry):
        a, b, c = carry
        m = riota == ((i_ref[:] + k) % R)
        p = jnp.sum(jnp.where(m, s_ref[:], 0), axis=0, keepdims=True)
        s_ref[:] = jnp.where(m, p + 1, s_ref[:])
        return (a + p, b ^ p, jnp.maximum(c, p))

    z = jnp.zeros((1, CB), jnp.int32)
    a, b, c = jax.lax.fori_loop(0, 64, body, (z, z, z))
    o_ref[:] = a + b + c

run("fori_scratch_class_ops", k_loop,
    jax.ShapeDtypeStruct((1, CB), jnp.int32), (tab, idx),
    scratch=(pltpu.VMEM((R, CB), jnp.int32),))

print("probe2 done; backend =", jax.default_backend())
