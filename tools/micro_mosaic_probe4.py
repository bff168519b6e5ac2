"""Probe 4: take_along_axis at (1,128) — the v2 _shared_lookup shape at
CB=128 — plus fallback idioms if it fails."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_shape, args):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.block_until_ready(jax.jit(f)(*args))
        print(f"PASS {name}")
        return np.asarray(r)
    except Exception as e:
        print(f"FAIL {name}: {str(e).splitlines()[-1][:160]}")
        return None


def k_ta(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)


tab1 = jnp.arange(128, dtype=jnp.int32)[None, :]
idx1 = ((jnp.arange(128, dtype=jnp.int32) * 13) % 128)[None, :]
r = run("take_along_1x128", k_ta,
        jax.ShapeDtypeStruct((1, 128), jnp.int32), (tab1, idx1))
if r is not None:
    print("   values:", "OK" if (r == np.asarray(idx1)).all() else "WRONG")


# fallback A: pad indices to (8,128), gather, use row 0
def k_pad(t_ref, i_ref, o_ref):
    tab = jnp.broadcast_to(t_ref[0:1, :], (8, 128))
    idx = jnp.broadcast_to(i_ref[0:1, :], (8, 128))
    g = jnp.take_along_axis(tab, idx, axis=1)
    o_ref[:] = g[0:1, :]

r = run("take_along_pad8_row0", k_pad,
        jax.ShapeDtypeStruct((1, 128), jnp.int32), (tab1, idx1))
if r is not None:
    print("   values:", "OK" if (r == np.asarray(idx1)).all() else "WRONG")


# fallback B: (2,128) with dup row
def k_pad2(t_ref, i_ref, o_ref):
    tab = jnp.broadcast_to(t_ref[0:1, :], (2, 128))
    idx = jnp.broadcast_to(i_ref[0:1, :], (2, 128))
    g = jnp.take_along_axis(tab, idx, axis=1)
    o_ref[:] = g[0:1, :]

r = run("take_along_pad2_row0", k_pad2,
        jax.ShapeDtypeStruct((1, 128), jnp.int32), (tab1, idx1))
if r is not None:
    print("   values:", "OK" if (r == np.asarray(idx1)).all() else "WRONG")

print("probe4 done; backend =", jax.default_backend())
