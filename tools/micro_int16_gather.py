"""Probe: masked class gather/commit at int16 vs int32 storage.

PERF.md says the v2 kernel is at its vector-work roofline: ~26 masked
class gathers/commits per position over [rows, CB] tiles.  16-bit
storage packs two sublanes per vreg word on v5e, so the where/add/select
chain should cost ~half the vregs *if* Mosaic lowers int16
iota/compare/select/sum cleanly.  This measures one synthetic "slot
class" update loop in both widths.

Run on the chip:  python tools/micro_int16_gather.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CB = 512
ROWSC = 256          # the big ltree7-sized class
STEPS = 512          # positions simulated


def make_kernel(dtype):
    def kern(idx_ref, out_ref, s_ref):
        s_ref[:] = jnp.full((ROWSC, CB), 1024, dtype)

        def body(i, acc):
            idx = idx_ref[pl.ds(i % 8, 1), :]                  # [1, CB] i32
            t = s_ref[:]
            ri = jax.lax.broadcasted_iota(jnp.int32, (ROWSC, CB), 0)
            m = ri == idx
            if dtype == jnp.int16:
                p = jnp.sum(jnp.where(m, t, 0).astype(jnp.int32), axis=0,
                            keepdims=True).astype(jnp.int16)
                adapted = (p - (p >> 5)).astype(jnp.int16)
            else:
                p = jnp.sum(jnp.where(m, t, 0), axis=0, keepdims=True)
                adapted = p - (p >> 5)
            s_ref[:] = jnp.where(m, adapted, t)
            return acc + p.astype(jnp.int32)

        acc = jax.lax.fori_loop(0, STEPS, body, jnp.zeros((1, CB), jnp.int32))
        out_ref[:] = acc

    return kern


@functools.partial(jax.jit, static_argnames=("dtype",))
def run(idx, dtype):
    return pl.pallas_call(
        make_kernel(dtype),
        grid=(1,),
        in_specs=[pl.BlockSpec((8, CB), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, CB), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, CB), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ROWSC, CB), dtype)],
    )(idx)


def main():
    idx = jnp.asarray(np.random.randint(0, ROWSC, (8, CB)), jnp.int32)
    for name, dt in (("int32", jnp.int32), ("int16", jnp.int16)):
        try:
            out = run(idx, dt)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(20):
                out = run(idx, dt)
            jax.block_until_ready(out)
            dt_s = (time.time() - t0) / 20
            per_slot = dt_s / STEPS * 1e9
            print(f"{name}: {dt_s*1e3:.3f} ms/call, {per_slot:.1f} ns/slot-update")
        except Exception as e:
            print(f"{name}: FAILED: {str(e)[:300]}")


if __name__ == "__main__":
    main()
