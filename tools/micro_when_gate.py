"""Probe: scalar reduction (jnp.max over a [1,CB] mask) as a pl.when
condition inside a fori body — the gating primitive for skipping whole
slot groups per position when no lane needs them (VERDICT r2 item 4).

Measures a ~26-iteration fori over [1, CB] work gated vs ungated.
"""
import sys, os as _os, time
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CB = 512
STEPS = 256
WORK = 24


def _kernel(x_ref, o_ref, acc_ref, *, gated):
    acc_ref[:] = jnp.zeros((8, CB), jnp.int32)

    def body(ii, _):
        v = x_ref[pl.ds(ii % 8, 1), :]
        act = (v & 1) == (ii & 1)
        any_act = jnp.max(jnp.where(act, 1, 0)) > 0

        def work():
            a = acc_ref[0:1, :]
            for k in range(WORK):
                a = a + jnp.where(act, (v >> (k % 5)) * (k + 1), 0)
            acc_ref[0:1, :] = a

        if gated:
            pl.when(any_act)(work)
        else:
            work()
        return 0

    jax.lax.fori_loop(0, STEPS, body, 0)
    o_ref[:] = acc_ref[:]


def run(gated, x):
    f = pl.pallas_call(
        functools.partial(_kernel, gated=gated),
        in_specs=[pl.BlockSpec((8, CB), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, CB), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, CB), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, CB), jnp.int32)],
    )
    g = jax.jit(lambda a: f(a))
    r = jax.block_until_ready(g(x))
    t0 = time.time()
    for _ in range(50):
        r = g(x)
    jax.block_until_ready(r)
    return np.asarray(r), (time.time() - t0) / 50 * 1e6


# all-active input vs never-active input
rng = np.random.default_rng(0)
x_act = jnp.asarray(rng.integers(0, 2**20, (8, CB)), jnp.int32) | 1  # odd
x_act = x_act - (x_act & 1)  # make all even -> act true when ii even
r0, t0 = run(False, x_act)
r1, t1 = run(True, x_act)
assert np.array_equal(r0, r1), "gated != ungated"
print(f"half-active: ungated {t0:.1f} us, gated {t1:.1f} us")
