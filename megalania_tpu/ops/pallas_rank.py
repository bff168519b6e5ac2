"""Candidate ranking kernel: cost all NC proposals per chain in VMEM.

moves.rank_candidates costs ~62 candidate packets x 26 probability
slots per chain with XLA gathers from the flat probability vector —
measured 3x the fused repair kernel's own time at C=512 (the per-slot
gather/lookup HLOs dominate).  This kernel performs the identical
integer costing against the class-decomposed probability layout
(ops/problayout.py) entirely in VMEM: per slot it reads only its class'
few sublane rows, and the LOG2 cost is the f32 exponent trick + packed
correction word, bit-identical to the table (ops/pallas_repair2.py).

Semantics: exact mirror of ops/bitplan.make_bit_plan + plan_cost —
read-only costing under the chain's recorded site state (rec_ctx,
rec_dists) and the final probabilities of the last repair pass, i.e.
the same ranking state moves.propose uses.  Reference contrast: the
reference costs ONE candidate at a time through a fresh perplexity
encoder + 5.2 KB state copy (top_k_packet_finder.c:95-117).

Candidates are packed like slab entries (models/packets.py) with the
live bit as the validity flag; metric = cost // max(len, 1), invalid ->
BIG (matches moves.rank_candidates).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tables as T
from . import problayout as PL
from .pallas_repair2 import (_f32_log2_cost, _shared_lookup,
                             _shared_lookup_batch, _cls_gather,
                             _bit_length, rt_offset_table)
from ..models import packets as P

PROB_ONE = T.PROB_ONE
PACKED_ROWS = PL.PACKED_ROWS
BIG = 2 ** 30

# st_ref row layout (rows 5-7 are sublane-alignment padding)
ST_CTX, ST_D0, ST_D1, ST_D2, ST_D3 = range(5)
ST_ROWS = 8


def _exact_div(a, b):
    """floor(a / b) for int32 a >= 0, b >= 1 via f32 + one correction."""
    q = jnp.floor(a.astype(jnp.float32) / b.astype(jnp.float32)
                  ).astype(jnp.int32)
    r = a - q * b
    q = jnp.where(r < 0, q - 1, jnp.where(r >= b, q + 1, q))
    return q


def _kernel(probs_ref, cand_ref, st_ref, corrw_ref, rtoff_ref,
            out_ref, *, NC, CB):
    corrw = corrw_ref[:]
    rtoff = rtoff_ref[:]
    s_ref = probs_ref

    ctx = st_ref[ST_CTX:ST_CTX + 1, :]
    d0 = st_ref[ST_D0:ST_D0 + 1, :]
    d1 = st_ref[ST_D1:ST_D1 + 1, :]
    d2 = st_ref[ST_D2:ST_D2 + 1, :]
    d3 = st_ref[ST_D3:ST_D3 + 1, :]

    def body(k, _):
        entry = cand_ref[pl.ds(k, 1), :].astype(jnp.uint32)
        ptype = ((entry >> P.TYPE_SHIFT) & P.TYPE_MASK).astype(jnp.int32)
        dist = (entry & P.DIST_MASK).astype(jnp.int32)
        length = ((entry >> P.LEN_SHIFT) & P.LEN_MASK).astype(jnp.int32)
        valid = ((entry >> P.LIVE_SHIFT) & 1).astype(jnp.int32) == 1

        is_lit = ptype == P.LIT
        is_match = ptype == P.MATCH
        is_srep = ptype == P.SREP
        is_lrep = ptype == P.LREP
        is_rep = is_srep | is_lrep
        # literal candidates are costed OUTSIDE the kernel (the 8 masked
        # 768-row lit-class gathers per candidate made the Mosaic compile
        # intractable — PERF.md); the wrapper overwrites their metric
        act = valid & ~is_lit

        # slot collection: gather all probs first, then ONE batched cost
        # pass (same op-count lever as the repair kernel's batched phase)
        ps_list, bit_list, act_list = [], [], []

        def slot(name, idx, bit, a):
            p, _, _ = _cls_gather(s_ref, name, idx, CB)
            ps_list.append(p)
            bit_list.append(bit)
            act_list.append(a)

        # header flag bits (bitplan slots 0..4)
        b3 = is_lrep & (dist != 0)
        b4 = jnp.where(b3, (dist != 1).astype(jnp.int32),
                       is_lrep.astype(jnp.int32))
        b5 = (dist != 2).astype(jnp.int32)
        slot("ismatch", ctx, (~is_lit).astype(jnp.int32), act)
        slot("isrep", ctx, is_rep.astype(jnp.int32), act & ~is_lit)
        slot("g0", ctx, b3.astype(jnp.int32), act & is_rep)
        slot("g1r0l", jnp.where(b3, ctx, 12 + ctx), b4, act & is_rep)
        slot("g2", ctx, b5, act & is_rep & b3 & (b4 == 1))

        # length coder (slots 5..14)
        len_act = act & (is_match | is_lrep)
        len2 = jnp.maximum(length - T.MATCH_LEN_MIN, 0)
        repc = is_lrep.astype(jnp.int32)
        c1 = (len2 >= 8).astype(jnp.int32)
        c2 = (len2 >= 16).astype(jnp.int32)
        slot("lch", repc, c1, len_act)
        slot("lch", 2 + repc, c2, len_act & (c1 == 1))
        nbits = jnp.where(c2 == 1, 8, 3)
        tval = jnp.where(c1 == 0, len2,
                         jnp.where(c2 == 0, len2 - 8, len2 - 16))
        for j in range(8):
            if j < 3:
                tsel = jnp.where(c2 == 1, 4 + repc, repc * 2 + c1)
            else:
                tsel = repc
            idx = (tsel << j) + (tval >> jnp.maximum(nbits - j, 0))
            bit = (tval >> jnp.maximum(nbits - 1 - j, 0)) & 1
            slot(f"ltree{j}", idx, bit, len_act & (j < nbits))

        # distance coder (slots 15..25 + direct bits)
        act_d = act & is_match
        bl = _bit_length(dist)
        nlb_t = jnp.maximum(bl - 2, 0)
        high = dist >> nlb_t
        ps = jnp.where(dist < 4, dist, nlb_t * 2 + high)
        len_ctx = jnp.minimum(len2, 3)
        for j in range(6):
            idx = (len_ctx << j) + (ps >> (6 - j))
            bit = (ps >> (5 - j)) & 1
            slot(f"dst{j}", idx, bit, act_d)
        midrange = (ps >= 4) & (ps < 14)
        nlb = jnp.where(midrange, (ps >> 1) - 1, 4)
        low = dist & ((1 << nlb) - 1)
        tid = jnp.where(midrange, ps - 4, 10)
        act_rt = act_d & (ps >= 4)
        rev = jnp.zeros((1, CB), jnp.int32)
        for t in range(5):
            off = _shared_lookup(16 * t + tid, rtoff, CB)
            bit = (low >> t) & 1
            slot(f"rt{t}", off + rev, bit, act_rt & (t < nlb))
            rev = (rev << 1) | bit

        while len(ps_list) % 8 != 0:         # sublane-align the batch
            ps_list.append(jnp.full((1, CB), 1, jnp.int32))
            bit_list.append(0)
            act_list.append(jnp.zeros((1, CB), jnp.bool_))
        Pm = jnp.concatenate(ps_list, axis=0)
        Bm = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(b, jnp.int32), (1, CB))
             for b in bit_list], axis=0)
        Am = jnp.concatenate(                # bool = mask regs: widen
            [a.astype(jnp.int32) for a in act_list], axis=0) == 1
        pc = jnp.clip(jnp.where(Bm == 1, PROB_ONE - Pm, Pm),
                      1, PROB_ONE - 1)
        c32 = _f32_log2_cost(pc)
        w = _shared_lookup_batch(pc >> 4, corrw, CB)
        cval = ((w >> ((pc & 15) * 2)) & 3) - 1
        cost = jnp.sum(jnp.where(Am, c32 + cval, 0), axis=0,
                       keepdims=True)
        n_direct = jnp.where(act_d & (ps >= 14), nlb_t - 4, 0)
        cost = cost + (n_direct << T.PROB_BITS)

        metric = _exact_div(cost, jnp.maximum(length, 1))
        out_ref[pl.ds(k, 1), :] = jnp.where(act, metric, BIG)
        return 0

    jax.lax.fori_loop(0, NC, body, 0)


def _lit_metric(probsC, rec_ctx, rec_dists, byte, match_byte, log2, f2p,
                prev_byte, lc):
    """Exact literal-packet cost per chain via the flat bit plan.

    One candidate per chain, so the XLA gather path is cheap; moved out
    of the kernel because its masked 768-row lit-class gathers made the
    Mosaic compile intractable (PERF.md).  len(lit)=1 => metric = cost.
    The lc literal context rides this path too — the in-kernel
    candidates (match/rep) never touch the literal class."""
    from . import bitplan

    def one(rp, rc, rd, b, m, pv):
        plan = bitplan.make_bit_plan(jnp.int32(P.LIT), jnp.int32(0),
                                     jnp.int32(1), rc, rd, b, m,
                                     prev_byte=pv, lc=lc)
        return bitplan.plan_cost_packed(rp, plan, log2, f2p, lc=lc)

    return jax.vmap(one)(probsC, rec_ctx, rec_dists, byte, match_byte,
                         jnp.broadcast_to(prev_byte, byte.shape))


@functools.partial(jax.jit, static_argnames=("cb", "interpret", "lc"))
def rank_pallas(probsC, candp, rec_ctx, rec_dists, byte, match_byte,
                log2, f2p, corr, cb: int = 128,
                interpret: bool = False, prev_byte=0, lc: int = 0):
    """probsC: [C, PACKED_ROWS] packed class probs (chain-major);
    candp: [C, NC] packed candidate entries (live bit = valid);
    byte/match_byte: data byte at the site / byte one rep0 back;
    -> metric [C, NC] int32 (BIG where invalid).

    Non-literal candidates are costed in the kernel; literal candidates
    (exactly one per chain in the enumeration) are costed by the XLA
    plan path and merged here — same bits either way."""
    C, NC = candp.shape
    cb = min(cb, C)
    assert C % cb == 0, (C, cb)
    NCp = -(-NC // 8) * 8

    st = jnp.zeros((ST_ROWS, C), jnp.int32)
    st = st.at[ST_CTX].set(rec_ctx)
    st = st.at[ST_D0].set(rec_dists[:, 0])
    st = st.at[ST_D1].set(rec_dists[:, 1])
    st = st.at[ST_D2].set(rec_dists[:, 2])
    st = st.at[ST_D3].set(rec_dists[:, 3])

    candT = jnp.pad(jnp.transpose(candp), ((0, NCp - NC), (0, 0)))
    probsT = jnp.transpose(probsC)          # [PROWS, C]
    rtoff = jnp.asarray(rt_offset_table())
    PROWS = PL.get_layout(lc).PACKED_ROWS   # lc only widens the lit tail

    kern = functools.partial(_kernel, NC=NCp, CB=cb)
    out = pl.pallas_call(
        kern,
        grid=(C // cb,),
        in_specs=[
            pl.BlockSpec((PROWS, cb), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NCp, cb), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ST_ROWS, cb), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NCp, cb), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NCp, C), jnp.int32),
        interpret=interpret,
    )(probsT, candT, st, corr, rtoff)
    metric = jnp.transpose(out[:NC, :])

    lit_cost = _lit_metric(probsC, rec_ctx, rec_dists, byte, match_byte,
                           log2, f2p, prev_byte, lc)         # [C]
    cand_type = (candp >> P.TYPE_SHIFT) & P.TYPE_MASK
    cand_valid = ((candp >> P.LIVE_SHIFT) & 1) == 1
    is_lit_cand = (cand_type == P.LIT) & cand_valid
    return jnp.where(is_lit_cand, lit_cost[:, None], metric)
