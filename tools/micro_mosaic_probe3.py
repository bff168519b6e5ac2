"""Probe 3: take_along_axis shapes + lane<->sublane reshape for the v2
shared-table (log2 correction, packed-data word) lookups."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_shape, args, scratch=()):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch),
        )
        r = jax.block_until_ready(jax.jit(f)(*args))
        print(f"PASS {name}")
        return np.asarray(r)
    except Exception as e:
        print(f"FAIL {name}: {str(e).splitlines()[0][:140]}")
        return None


def k_ta(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)


tab8 = jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32)[None, :], (8, 128))
idx8 = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 13) % 128
r = run("take_along_8x128", k_ta,
        jax.ShapeDtypeStruct((8, 128), jnp.int32), (tab8, idx8))
if r is not None:
    print("   values:", "OK" if (r == np.asarray(idx8)).all() else "WRONG")

tab2 = jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32)[None, :], (2, 128))
idx2 = (jnp.arange(2 * 128, dtype=jnp.int32).reshape(2, 128) * 7) % 128
r = run("take_along_2x128", k_ta,
        jax.ShapeDtypeStruct((2, 128), jnp.int32), (tab2, idx2))
if r is not None:
    print("   values:", "OK" if (r == np.asarray(idx2)).all() else "WRONG")


# reshape [1,256] <-> [2,128] round trip inside kernel
def k_rs(a_ref, o_ref):
    x = a_ref[:].reshape(2, 128)
    y = x + 1
    o_ref[:] = y.reshape(1, 256)

a = jnp.arange(256, dtype=jnp.int32)[None, :]
r = run("reshape_1x256_2x128_rt", k_rs,
        jax.ShapeDtypeStruct((1, 256), jnp.int32), (a,))
if r is not None:
    print("   values:", "OK" if (r == np.asarray(a) + 1).all() else "WRONG")


# combined: corr-style lookup for [1,256] values via reshape + gather
def k_corr(v_ref, t_ref, o_ref):
    idx = v_ref[:].reshape(2, 128)
    tab = jnp.broadcast_to(t_ref[0:1, :], (2, 128))
    got = jnp.take_along_axis(tab, idx, axis=1)
    o_ref[:] = got.reshape(1, 256)

tabc = (jnp.arange(128, dtype=jnp.int32) * 3)[None, :]
vals = ((jnp.arange(256, dtype=jnp.int32) * 31) % 128)[None, :]
r = run("corr_lookup_1x256", k_corr,
        jax.ShapeDtypeStruct((1, 256), jnp.int32), (vals, tabc))
if r is not None:
    want = np.asarray(tabc)[0][np.asarray(vals)[0]]
    print("   values:", "OK" if (r[0] == want).all() else "WRONG")


# wide shared table (512 entries) via 4 gathers + select, values [1,256]
def k_wide(v_ref, t_ref, o_ref):
    idx = v_ref[:].reshape(2, 128)
    got = jnp.zeros((2, 128), jnp.int32)
    for c in range(4):
        tab = jnp.broadcast_to(t_ref[c:c + 1, :], (2, 128))
        g = jnp.take_along_axis(tab, idx & 127, axis=1)
        got = jnp.where((idx >> 7) == c, g, got)
    o_ref[:] = got.reshape(1, 256)

tw = jnp.arange(512, dtype=jnp.int32).reshape(4, 128) * 5
vw = ((jnp.arange(256, dtype=jnp.int32) * 97) % 512)[None, :]
r = run("wide_lookup_512_1x256", k_wide,
        jax.ShapeDtypeStruct((1, 256), jnp.int32), (vw, tw))
if r is not None:
    want = (np.arange(512) * 5)[np.asarray(vw)[0]]
    print("   values:", "OK" if (r[0] == want).all() else "WRONG")

print("probe3 done; backend =", jax.default_backend())
