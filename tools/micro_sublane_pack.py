"""Probe: cost of [1, CB] per-chain elementwise chains vs [8, CB/8].

Theory (PERF.md follow-up): the v2 kernel's per-slot fixed overhead is
dozens of [1, CB] elementwise ops (index math, cost/adapt, masks); a
[1, 512] int32 op occupies 4 vregs with 1/8 sublane utilization, so the
same math packed [8, 64] should cost ~1 vreg per op — up to 8x less for
the non-gather portion of the kernel.

Measures STEPS iterations of a ~40-op elementwise chain in both shapes.
Run on the chip: python tools/micro_sublane_pack.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CB = 512
STEPS = 2048


def chain_ops(x, y):
    """~40 int32 elementwise ops resembling one slot's scalar plumbing."""
    for _ in range(5):
        b = (x >> 3) & 7
        c = jnp.where(b > 2, x + y, x - y)
        d = jnp.clip(c, 1, 2047)
        e = d + (d >> 5)
        f = jnp.where((e & 1) == 1, e - (e >> 5), e + ((2048 - e) >> 5))
        x = (f ^ y) & 0xFFFF
        y = y + (x >> 7)
    return x, y


def make_kernel(shape):
    def kern(a_ref, out_ref):
        def body(i, carry):
            x, y = carry
            return chain_ops(x, y + i)

        x0 = a_ref[:]
        y0 = x0 * 3
        x, y = jax.lax.fori_loop(0, STEPS, body, (x0, y0))
        out_ref[:] = x + y

    return kern


@functools.partial(jax.jit, static_argnames=("shape",))
def run(a, shape):
    return pl.pallas_call(
        make_kernel(shape),
        grid=(1,),
        in_specs=[pl.BlockSpec(shape, lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(shape, lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
    )(a)


def main():
    for shape in ((1, CB), (8, CB // 8), (8, CB), (8, 128)):
        a = jnp.asarray(np.random.randint(1, 2047, shape), jnp.int32)
        try:
            out = run(a, shape)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(20):
                out = run(a, shape)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / 20
            print(f"{shape}: {dt*1e3:.3f} ms/call "
                  f"({dt/STEPS*1e9:.1f} ns/step of ~40 ops)")
        except Exception as e:
            print(f"{shape}: FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    main()
