"""LZMA coder state as JAX arrays.

The compressor state (reference: /root/reference/src/lzma_state.h:64-74) is a
pytree of arrays so it can be vmapped over (chain, block) axes and carried
through `lax.scan`:

    probs : int32[PROBS_PAD]  adaptive probability model (flat, tables.py)
    ctx   : int32[]           ctx-state 0..11
    dists : int32[4]          rep-distance stack (stored as distance-1)
    pos   : int32[]           byte position in the block

Transitions re-derive /root/reference/src/lzma_state.c:29-81 as table
lookups / vector selects.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import tables as T
from . import packets as P


class CoderState(NamedTuple):
    probs: jnp.ndarray   # int32[PROBS_PAD]
    ctx: jnp.ndarray     # int32 scalar
    dists: jnp.ndarray   # int32[4]
    pos: jnp.ndarray     # int32 scalar


def fresh_state() -> CoderState:
    return CoderState(
        probs=jnp.asarray(T.init_probs_np(), jnp.int32),
        ctx=jnp.int32(0),
        dists=jnp.zeros(4, jnp.int32),
        pos=jnp.int32(0),
    )


def ctx_next(ctx, ptype):
    """Next ctx-state after encoding a packet of `ptype`.

    Pure arithmetic (no table constant): literal cools the state toward 0,
    match/srep/lrep jump to their post-states.
    """
    lit = jnp.where(ctx < 4, 0, jnp.where(ctx < 10, ctx - 3, ctx - 6))
    mat = jnp.where(ctx < 7, 7, 10)
    sr = jnp.where(ctx < 7, 9, 11)
    lr = jnp.where(ctx < 7, 8, 11)
    return jnp.where(
        ptype == P.LIT, lit,
        jnp.where(ptype == P.MATCH, mat, jnp.where(ptype == P.SREP, sr, lr)),
    )


def dists_next(dists, ptype, dist_field):
    """Rep-distance stack update.

    MATCH pushes the explicit distance; LREP promotes stack entry
    `dist_field` to the front (entries above it shift down); LIT/SREP leave
    the stack unchanged.
    """
    pushed = jnp.concatenate([dist_field[None], dists[:3]])
    k = dist_field
    j = jnp.arange(4)
    promoted = jnp.where(
        j == 0,
        dists[k],
        jnp.where(j <= k, dists[jnp.maximum(j - 1, 0)], dists),
    )
    return jnp.where(
        ptype == P.MATCH, pushed, jnp.where(ptype == P.LREP, promoted, dists)
    )
