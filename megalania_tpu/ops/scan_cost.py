"""Exact whole-parse costing as a `lax.scan` over byte positions.

Replaces the reference's per-move full re-encode
(/root/reference/src/packet_slab_neighbour.c:154-173) with a vectorizable
scan: one step per byte position, active only at live packet starts; each
step is one bit-plan gather/scatter.  vmap over a leading chain axis gives
thousands of parses costed per pass.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import bitplan
from . import tables as T
from ..models import lzma_state as S
from ..models import packets as P
from ..utils import fixedpoint as fp


class CostCarry(NamedTuple):
    probs: jnp.ndarray    # int32[PROBS_PAD]
    ctx: jnp.ndarray      # int32
    dists: jnp.ndarray    # int32[4]
    live_pos: jnp.ndarray  # int32
    cost_hi: jnp.ndarray  # int32
    cost_lo: jnp.ndarray  # int32


def init_carry(lc: int = 0) -> CostCarry:
    return CostCarry(
        probs=jnp.asarray(T.init_probs_np(lc=lc), jnp.int32),
        ctx=jnp.int32(0),
        dists=jnp.zeros(4, jnp.int32),
        live_pos=jnp.int32(0),
        cost_hi=jnp.int32(0),
        cost_lo=jnp.int32(0),
    )


def packet_step(carry: CostCarry, i, entry, data, log2, lc: int = 0):
    """Process slab position i.  Returns (carry', live_flag)."""
    active = i == carry.live_pos
    ptype, dist, length, _ = P.unpack(entry)
    byte = data[i]
    mb_idx = jnp.clip(i - carry.dists[0] - 1, 0, data.shape[0] - 1)
    match_byte = data[mb_idx]
    prev_byte = jnp.where(i > 0, data[jnp.maximum(i - 1, 0)], 0)

    plan = bitplan.make_bit_plan(
        ptype, dist, length, carry.ctx, carry.dists, byte, match_byte,
        prev_byte=prev_byte, lc=lc,
    )
    plan = bitplan.BitPlan(
        idx=plan.idx,
        bit=plan.bit,
        active=plan.active & active,
        n_direct=jnp.where(active, plan.n_direct, 0),
        direct_val=plan.direct_val,
    )
    probs, cost = bitplan.apply_plan(carry.probs, plan, log2, lc=lc)
    hi, lo = fp.accumulate(carry.cost_hi, carry.cost_lo, cost)
    return CostCarry(
        probs=probs,
        ctx=jnp.where(active, S.ctx_next(carry.ctx, ptype), carry.ctx),
        dists=jnp.where(active, S.dists_next(carry.dists, ptype, dist), carry.dists),
        live_pos=carry.live_pos + jnp.where(active, length, 0),
        cost_hi=hi,
        cost_lo=lo,
    ), active


def parse_cost(slab, data, log2, unroll: int = 1, lc: int = 0):
    """Exact cost of one parse.

    slab: uint32[n] packed packets; data: int32[n] bytes; log2: the cost
    table as a device array (traced arg — see bitplan.py note).
    Returns (cost_hi, cost_lo, final_probs, live_mask).
    """
    n = slab.shape[0]

    def step(carry, xs):
        i, entry = xs
        carry, live = packet_step(carry, i, entry, data, log2, lc=lc)
        return carry, live

    carry, live = jax.lax.scan(
        step,
        init_carry(lc),
        (jnp.arange(n, dtype=jnp.int32), slab),
        unroll=unroll,
    )
    return carry.cost_hi, carry.cost_lo, carry.probs, live


_parse_cost_jit = jax.jit(parse_cost, static_argnames=("unroll", "lc"))


def parse_cost_jit(slab, data, unroll: int = 1, lc: int = 0):
    return _parse_cost_jit(slab, data, jnp.asarray(T.LOG2_TABLE_I32),
                           unroll=unroll, lc=lc)
