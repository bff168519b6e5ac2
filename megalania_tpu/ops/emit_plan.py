"""Compile a final parse into a dense op stream for the native emitter.

A light scan (carry = ctx/dists/live position only — no probability state,
since the emitter adapts probabilities itself) that outputs each
position's bit plan.  Masked positions produce all-inactive rows, so the
host can feed the arrays straight to the C++ range coder.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import bitplan
from ..models import lzma_state as S
from ..models import packets as P


def emit_plan(slab, data, lc: int = 0):
    """-> (idx[n,NSLOTS] i32, bit[n,NSLOTS] i32, active[n,NSLOTS] bool,
            n_direct[n] i32, direct_val[n] i32)"""
    n = slab.shape[0]

    def step(carry, xs):
        ctx, dists, live_pos = carry
        i, entry = xs
        active = i == live_pos
        ptype, dist, length, _ = P.unpack(entry)
        byte = data[i]
        mb_idx = jnp.clip(i - dists[0] - 1, 0, data.shape[0] - 1)
        prev = jnp.where(i > 0, data[jnp.maximum(i - 1, 0)], 0)
        plan = bitplan.make_bit_plan(
            ptype, dist, length, ctx, dists, byte, data[mb_idx],
            prev_byte=prev, lc=lc,
        )
        out = (
            plan.idx,
            plan.bit,
            plan.active & active,
            jnp.where(active, plan.n_direct, 0),
            plan.direct_val,
        )
        carry = (
            jnp.where(active, S.ctx_next(ctx, ptype), ctx),
            jnp.where(active, S.dists_next(dists, ptype, dist), dists),
            live_pos + jnp.where(active, length, 0),
        )
        return carry, out

    init = (jnp.int32(0), jnp.zeros(4, jnp.int32), jnp.int32(0))
    _, outs = jax.lax.scan(
        step, init, (jnp.arange(n, dtype=jnp.int32), slab), unroll=1
    )
    return outs


emit_plan_jit = jax.jit(emit_plan, static_argnames=("lc",))
