"""Probe: which dynamic-gather idioms does Mosaic lower on this backend?"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

S, L = 8, 128


def run(name, kernel, *args, out_shape):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        out = jax.jit(f)(*args)
        out = np.asarray(out)
        print(f"{name}: OK {out.ravel()[:4]}", flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


tab = jnp.arange(S * L, dtype=jnp.int32).reshape(S, L)
idx_lane = (jnp.arange(S * L, dtype=jnp.int32).reshape(S, L) * 7) % L
idx_sub = (jnp.arange(S * L, dtype=jnp.int32).reshape(S, L) * 3) % S
o = jax.ShapeDtypeStruct((S, L), jnp.int32)

def k_tala_lane(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

def k_tala_sub(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

run("take_along_axis lanes", k_tala_lane, tab, idx_lane, out_shape=o)
run("take_along_axis sublanes", k_tala_sub, tab, idx_sub, out_shape=o)

# big-table variant: gather [CB, P] per-sublane indices along lanes
CB, P = 8, 2688
tab2 = jnp.arange(CB * P, dtype=jnp.int32).reshape(CB, P)
idx2 = (jnp.arange(CB, dtype=jnp.int32)[:, None] * 997 + 13) % P
idx2 = jnp.broadcast_to(idx2, (CB, 1)).astype(jnp.int32)
o2 = jax.ShapeDtypeStruct((CB, 1), jnp.int32)

def k_big(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

run("take_along big [CB,P]->[CB,1]", k_big, tab2, idx2, out_shape=o2)

# scatter: .at[].set along lanes
def k_scat(t_ref, i_ref, o_ref):
    t = t_ref[:]
    upd = jnp.full((S, L), 7, jnp.int32)
    o_ref[:] = jnp.take_along_axis(t, i_ref[:], axis=1) * 0 + t
    o_ref[:] = t.at[jnp.arange(S)[:, None], i_ref[:, :1]].set(-1)

run("at-set scatter", k_scat, tab, idx_lane, out_shape=o)

# pltpu.roll with dynamic shift?
def k_roll(t_ref, i_ref, o_ref):
    o_ref[:] = pltpu.roll(t_ref[:], shift=3, axis=1)

run("pltpu.roll static", k_roll, tab, idx_lane, out_shape=o)
print("jax", jax.__version__)
