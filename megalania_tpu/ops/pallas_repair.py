"""Fused repair+cost pass as a single Pallas TPU kernel.

This is the TPU-native realization of the reference's per-move full-parse
re-encode (/root/reference/src/packet_slab_neighbour.c:82-173 plus the
per-bit encode path lzma_packet_encoder.c / probability_model.c:5-15,
perplexity_encoder.c:6-17): the entire n-position scan runs inside ONE
kernel invocation per chain block, with the adaptive probability model
resident in VMEM for the whole pass.

Semantics are bit-identical to ops/repair_scan.py (the portable lax.scan
implementation, used as the golden reference in tests); the differences
are purely in realization:

  * chains ride the sublane axis: probs [CB, PROBS_PAD], all per-chain
    state [CB, 1] / [CB, k];
  * probability gather/scatter uses the (iota == idx) compare-select
    idiom, which Mosaic turns into efficient per-sublane lane ops — the
    pass is VMEM-bandwidth-bound on the probs array (measured, see
    tools/micro_pallas_*.py);
  * the exact LOG2 fixed-point table lookup is replaced by float32
    log2 plus a bit-packed +-1 correction table (built per backend by
    log2_correction(), so kernel cost == table cost exactly);
  * the slab is streamed transposed [n, CB] with one row read/write and
    a [1,CB]<->[CB,1] transpose per step (measured ~free);
  * the data byte at per-chain offsets (rep0 match byte) is gathered
    from a 4-bytes-per-word packed copy of the block, shrinking that
    per-step table pass from n to n/4 lanes.

One annealing move per chain = one full exact re-cost, the same unit of
work as the reference's packet_slab_neighbour_generate.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tables as T
from ..models import packets as P

NSLOTS = 26
PROB_ONE = T.PROB_ONE
P_PAD = T.PROBS_PAD
DEAD = T.DEAD_SLOT
INV_PROB_ONE = 1.0 / PROB_ONE


# ---------------------------------------------------------------------------
# Exact log2: float32 + packed correction
# ---------------------------------------------------------------------------

def _f32_log2_cost(pc):
    """trunc(-log2(pc/2048)*2048) in float32 — the kernel's raw estimate."""
    x = pc.astype(jnp.float32) * jnp.float32(INV_PROB_ONE)
    return jnp.trunc(-jnp.log2(x) * jnp.float32(PROB_ONE)).astype(jnp.int32)


def _log2_probe_kernel(out_ref):
    i = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    out_ref[:] = _f32_log2_cost(jnp.maximum(i, 1))


@functools.cache
def log2_correction(interpret: bool = False) -> np.ndarray:
    """int32[1, 128] bit-packed correction: exact = f32 + corr, corr in
    {-1, 0, +1} stored as 2-bit (value+1) at bit offset (p & 15) * 2.

    Built by running the same float32 sequence the kernel executes on the
    same backend, so the sum is exact by construction.
    """
    raw = pl.pallas_call(
        _log2_probe_kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )()
    approx = np.asarray(raw).reshape(-1).astype(np.int64)
    exact = T.LOG2_TABLE_NP.copy()
    exact[0] = exact[1]                     # probe clamps index 0 to 1
    diff = exact - approx
    if diff.min() < -1 or diff.max() > 1:
        raise RuntimeError(
            "device float32 log2 deviates by >1 from the exact table "
            f"(min {diff.min()}, max {diff.max()}); widen the correction"
        )
    enc = (diff + 1).astype(np.uint64)      # 2-bit codes
    packed = np.zeros(128, np.uint64)
    for j in range(16):
        packed |= enc[j::16] << np.uint64(2 * j)
    return packed.astype(np.int64).astype(np.int32).reshape(1, 128)


# ---------------------------------------------------------------------------
# In-kernel bit-plan construction ([CB, k]-shaped port of ops/bitplan.py)
# ---------------------------------------------------------------------------

def _tree_msb(value, nbits, base, nslots, CB):
    j = jax.lax.broadcasted_iota(jnp.int32, (CB, nslots), 1)
    active = (j < nbits).astype(jnp.int32)
    m = (1 << j) | (value >> jnp.maximum(nbits - j, 0))
    bit = (value >> jnp.maximum(nbits - 1 - j, 0)) & 1
    return base + m, bit, active


def _tree_rev(value, nbits, base, nslots, CB):
    j = jax.lax.broadcasted_iota(jnp.int32, (CB, nslots), 1)
    rev = jnp.zeros((CB, nslots), jnp.int32)
    for t in range(nslots):
        vbit = (value >> t) & 1             # [CB, 1]
        sh = j - 1 - t
        rev = rev + jnp.where(sh >= 0, vbit << jnp.maximum(sh, 0), 0)
    m = (1 << j) | rev
    bit = (value >> j) & 1
    active = (j < nbits).astype(jnp.int32)
    return base + m, bit, active


def _bit_length(d):
    """32 - clz(d) for 0 <= d < 2**20 via the float32 exponent (exact)."""
    e = (jax.lax.bitcast_convert_type(d.astype(jnp.float32), jnp.int32)
         >> 23) - 126
    return jnp.maximum(e, 0)


def _make_plan(ptype, dist, length, ctx, byte, mb, CB):
    """Port of bitplan.make_bit_plan on [CB, 1] fields.  byte is a traced
    scalar (same for every chain); mb is the per-chain rep0 match byte.
    Returns (idx [CB,26], bit [CB,26], act [CB,26], n_direct [CB,1])."""
    is_lit = ptype == P.LIT
    is_match = ptype == P.MATCH
    is_srep = ptype == P.SREP
    is_lrep = ptype == P.LREP
    is_rep = is_srep | is_lrep

    # header flag bits (slots 0..4)
    b3 = is_lrep & (dist != 0)
    b4 = jnp.where(b3, (dist != 1).astype(jnp.int32),
                   is_lrep.astype(jnp.int32))
    b5 = (dist != 2).astype(jnp.int32)
    h_idx = jnp.concatenate([
        T.IS_MATCH + (ctx << T.POS_BITS_MAX),
        T.IS_REP + ctx,
        T.IS_REP_G0 + ctx,
        jnp.where(b3, T.IS_REP_G1 + ctx,
                  T.IS_REP0_LONG + (ctx << T.POS_BITS_MAX)),
        T.IS_REP_G2 + ctx,
    ], axis=1)
    h_bit = jnp.concatenate([
        (~is_lit).astype(jnp.int32),
        is_rep.astype(jnp.int32),
        b3.astype(jnp.int32),
        b4,
        b5,
    ], axis=1)
    h_act = jnp.concatenate([
        jnp.ones((CB, 1), jnp.int32),
        (~is_lit).astype(jnp.int32),
        is_rep.astype(jnp.int32),
        is_rep.astype(jnp.int32),
        (is_rep & b3 & (b4 == 1)).astype(jnp.int32),
    ], axis=1)

    # length coder (slots 5..14 for MATCH/LREP)
    len_active = is_match | is_lrep
    len2 = jnp.maximum(length - T.MATCH_LEN_MIN, 0)
    base = jnp.where(is_match, T.LEN, T.REP_LEN)
    c1 = len2 >= 8
    c2 = len2 >= 16
    tree_base = base + jnp.where(~c1, T.LEN_LOW,
                                 jnp.where(~c2, T.LEN_MID, T.LEN_HIGH))
    tree_nb = jnp.where(c2, 8, 3)
    tree_val = jnp.where(~c1, len2, jnp.where(~c2, len2 - 8, len2 - 16))
    lt_idx, lt_bit, lt_act = _tree_msb(tree_val, tree_nb, tree_base, 8, CB)
    len_idx = jnp.concatenate(
        [base + T.LEN_CHOICE1, base + T.LEN_CHOICE2, lt_idx], axis=1)
    len_bit = jnp.concatenate(
        [c1.astype(jnp.int32), c2.astype(jnp.int32), lt_bit], axis=1)
    len_i = len_active.astype(jnp.int32)
    len_act = jnp.concatenate(
        [len_i, (len_active & c1).astype(jnp.int32), lt_act * len_i], axis=1)

    # literal bits (overlay slots 5..12 when LIT)
    j8 = jax.lax.broadcasted_iota(jnp.int32, (CB, 8), 1)
    lbits = (byte >> (7 - j8)) & 1
    mbits = (mb >> (7 - j8)) & 1
    eq = (lbits == mbits).astype(jnp.int32)
    pe = jnp.ones((CB, 1), jnp.int32)
    pes = [pe]
    for t in range(7):                       # prefix product of eq
        pe = pe * eq[:, t:t + 1]
        pes.append(pe)
    prefix_eq = jnp.concatenate(pes, axis=1)
    matched = (ctx >= 7).astype(jnp.int32) * prefix_eq
    symbol = (1 << j8) | (byte >> (8 - j8))
    lit_idx = T.LIT + symbol + matched * ((1 + mbits) << 8)
    z2i = jnp.zeros((CB, 2), jnp.int32)
    lit_idx10 = jnp.concatenate([lit_idx, z2i], axis=1)
    lit_bit10 = jnp.concatenate([lbits, z2i], axis=1)
    lit_act10 = jnp.concatenate(
        [jnp.broadcast_to(is_lit.astype(jnp.int32), (CB, 8)),
         jnp.zeros((CB, 2), jnp.int32)], axis=1)

    mid_idx = jnp.where(is_lit, lit_idx10, len_idx)
    mid_bit = jnp.where(is_lit, lit_bit10, len_bit)
    mid_act = jnp.where(is_lit, lit_act10, len_act)

    # distance coder (slots 15..25 for MATCH)
    d = dist
    bl = _bit_length(d)
    nlb_t = jnp.maximum(bl - 2, 0)
    high = d >> nlb_t
    ps = jnp.where(d < 4, d, nlb_t * 2 + high)
    len_ctx = jnp.minimum(len2, 3)
    ds_idx, ds_bit, ds_act = _tree_msb(
        ps, jnp.full((CB, 1), 6, jnp.int32), T.DIST_SLOT + 64 * len_ctx,
        6, CB)
    ds_act = ds_act * is_match.astype(jnp.int32)

    midrange = (ps >= 4) & (ps < 14)
    nlb = jnp.where(midrange, (ps >> 1) - 1, 4)
    low = d & ((1 << nlb) - 1)
    rbase = jnp.where(midrange, T.POS_CODER + (high << nlb) - ps, T.ALIGN)
    rt_idx, rt_bit, rt_act = _tree_rev(low, nlb, rbase, 5, CB)
    rt_act = rt_act * (is_match & (ps >= 4)).astype(jnp.int32)

    n_direct = jnp.where(is_match & (ps >= 14), nlb_t - 4, 0)

    idx = jnp.concatenate([h_idx, mid_idx, ds_idx, rt_idx], axis=1)
    bit = jnp.concatenate([h_bit, mid_bit, ds_bit, rt_bit], axis=1)
    act = jnp.concatenate([h_act, mid_act, ds_act, rt_act], axis=1)
    return idx, bit, act, n_direct



# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _kernel(slabT_ref, qu_ref, data_ref, dpk_ref, cand_d_ref, cand_l_ref,
            corr_ref, out_slabT_ref, probs_ref, misc_ref, *, n, n4, M, CB):
    q = jnp.transpose(qu_ref[0:1, :]).astype(jnp.int32)       # [CB, 1]
    u = jnp.transpose(qu_ref[1:2, :]).astype(jnp.int32)

    lanesP = jax.lax.broadcasted_iota(jnp.int32, (CB, P_PAD), 1)
    lanes4 = jax.lax.broadcasted_iota(jnp.int32, (CB, n4), 1)
    lanesC = jax.lax.broadcasted_iota(jnp.int32, (CB, 128), 1)
    dpk = dpk_ref[:]                                           # [1, n4]
    corr = corr_ref[:]                                         # [1, 128]

    probs0 = jnp.where(lanesP < T.NUM_PROBS, T.PROB_INIT, 0).astype(jnp.int32)
    zc = jnp.zeros((CB, 1), jnp.int32)
    # the 4-deep rep-distance stacks ride the carry as four separate
    # [CB, 1] columns: [CB, 4] vectors in the loop carry trip a Mosaic
    # relayout failure ("non-singleton dim replicated in destination")
    # when layout inference disagrees across the back-edge.
    carry0 = (probs0, zc, (zc, zc, zc, zc), zc, zc, zc, zc,
              zc, (zc, zc, zc, zc), zc)

    def body(i, carry):
        (probs, ctx, dists, live, hi, lo, since, rctx, rdists, rlive) = carry

        entry = jnp.transpose(
            slabT_ref[pl.ds(i, 1), :]).astype(jnp.uint32)      # [CB, 1]
        byte = data_ref[i]                                     # scalar
        cd_row = cand_d_ref[pl.ds(i, 1), :]                    # [1, M]
        cl_row = cand_l_ref[pl.ds(i, 1), :]

        active = live == i
        at_u = u == i
        rctx = jnp.where(at_u, ctx, rctx)
        rdists = tuple(jnp.where(at_u, dists[j], rdists[j])
                       for j in range(4))
        rlive = jnp.where(at_u, live, rlive)

        ptype = ((entry >> P.TYPE_SHIFT) & P.TYPE_MASK).astype(jnp.int32)
        dist = (entry & P.DIST_MASK).astype(jnp.int32)
        length = ((entry >> P.LEN_SHIFT) & P.LEN_MASK).astype(jnp.int32)

        # rep0 match byte via the packed-word gather
        d0 = dists[0]
        jpos = jnp.clip(i - d0 - 1, 0, n - 1)
        word = jnp.sum(jnp.where(lanes4 == (jpos >> 2), dpk, 0),
                       axis=1, keepdims=True)
        mb = (word >> ((jpos & 3) * 8)) & 255

        # ---- repair rules (repair_scan._repair_entry) -------------------
        srep_ok = (i > 0) & (d0 + 1 <= i) & (mb == byte)
        count_ok = since < 4
        ls_type = jnp.where(srep_ok & count_ok, P.SREP,
                            jnp.where(srep_ok, ptype, P.LIT))
        valid_cols = []
        for js in range(4):
            dj = dists[js]
            hit = jnp.sum(
                jnp.where((cd_row == dj) & (cl_row >= length), 1, 0),
                axis=1, keepdims=True)
            valid_cols.append(
                jnp.where((hit > 0) & (dj + 1 <= i), 1, 0))
        cur_idx = jnp.clip(dist, 0, 3)
        cur_ok = jnp.where(
            cur_idx == 0, valid_cols[0],
            jnp.where(cur_idx == 1, valid_cols[1],
                      jnp.where(cur_idx == 2, valid_cols[2],
                                valid_cols[3]))) > 0
        # first valid stack index (argmax over 0/1 flags, order 0..3)
        first_valid = jnp.full((CB, 1), 3, jnp.int32)
        for js in (2, 1, 0):
            first_valid = jnp.where(valid_cols[js] != 0, js, first_valid)
        any_valid = (valid_cols[0] + valid_cols[1]
                     + valid_cols[2] + valid_cols[3]) > 0
        lrep_ok = cur_ok | any_valid
        lrep_idx = jnp.where(cur_ok, cur_idx, first_valid)
        fb_type = jnp.where(srep_ok & count_ok, P.SREP, P.LIT)

        is_ls = (ptype == P.LIT) | (ptype == P.SREP)
        is_lrep = ptype == P.LREP
        r_type = jnp.where(
            is_ls, ls_type,
            jnp.where(is_lrep, jnp.where(lrep_ok, P.LREP, fb_type), ptype))
        r_dist = jnp.where(is_lrep & lrep_ok, lrep_idx,
                           jnp.where(is_ls | is_lrep, 0, dist))
        r_len = jnp.where(is_lrep & ~lrep_ok, 1,
                          jnp.where(is_ls, 1, length))

        in_repair = active & (i >= q)
        ptype = jnp.where(in_repair, r_type, ptype)
        dist = jnp.where(in_repair, r_dist, dist)
        length = jnp.where(in_repair, r_len, length)

        # ---- bit plan + probs gather/adapt/cost -------------------------
        idx, bit, act, n_direct = _make_plan(ptype, dist, length, ctx,
                                             byte, mb, CB)
        act = act * active.astype(jnp.int32)
        n_direct = jnp.where(active, n_direct, 0)

        cost = (n_direct << T.PROB_BITS)
        for s in range(NSLOTS):
            a_s = act[:, s:s + 1] != 0
            safe = jnp.where(a_s, idx[:, s:s + 1], DEAD)
            b_s = bit[:, s:s + 1]
            m = lanesP == safe
            p = jnp.sum(jnp.where(m, probs, 0), axis=1, keepdims=True)
            pc = jnp.clip(jnp.where(b_s == 1, PROB_ONE - p, p), 1,
                          PROB_ONE - 1)
            c32 = _f32_log2_cost(pc)
            w = jnp.sum(jnp.where(lanesC == (pc >> 4), corr, 0),
                        axis=1, keepdims=True)
            cval = ((w >> ((pc & 15) * 2)) & 3) - 1
            cost = cost + jnp.where(a_s, c32 + cval, 0)
            adapted = jnp.where(
                b_s == 1, p - (p >> T.MOVE_BITS),
                p + ((PROB_ONE - p) >> T.MOVE_BITS))
            probs = jnp.where(m, adapted, probs)

        lo = lo + cost
        hi = hi + (lo >> 16)
        lo = lo & 0xFFFF

        # ---- state transitions (models/lzma_state.py) -------------------
        lit_n = jnp.where(ctx < 4, 0, jnp.where(ctx < 10, ctx - 3, ctx - 6))
        mat_n = jnp.where(ctx < 7, 7, 10)
        sr_n = jnp.where(ctx < 7, 9, 11)
        lr_n = jnp.where(ctx < 7, 8, 11)
        ctx_n = jnp.where(ptype == P.LIT, lit_n,
                          jnp.where(ptype == P.MATCH, mat_n,
                                    jnp.where(ptype == P.SREP, sr_n, lr_n)))
        ctx = jnp.where(active, ctx_n, ctx)

        # push (MATCH: [dist, d0, d1, d2]) / promote (LREP index `dist`:
        # [d_k, then shift 0..k-1 down]) — all in [CB, 1] columns
        dk = jnp.where(dist == 0, dists[0],
                       jnp.where(dist == 1, dists[1],
                                 jnp.where(dist == 2, dists[2], dists[3])))
        is_m = ptype == P.MATCH
        is_r = ptype == P.LREP
        upd = active & (is_m | is_r)
        new0 = jnp.where(is_m, dist, dk)
        new_cols = [jnp.where(upd, new0, dists[0])]
        for js in (1, 2, 3):
            shift_in = jnp.where(is_m | (dist >= js), dists[js - 1],
                                 dists[js])
            new_cols.append(jnp.where(upd, shift_in, dists[js]))
        dists = tuple(new_cols)

        out_entry = jnp.where(
            active,
            (dist.astype(jnp.uint32) & P.DIST_MASK)
            | ((length.astype(jnp.uint32) & P.LEN_MASK) << P.LEN_SHIFT)
            | ((ptype.astype(jnp.uint32) & P.TYPE_MASK) << P.TYPE_SHIFT)
            | jnp.uint32(1 << P.LIVE_SHIFT),
            entry & jnp.uint32(~(1 << P.LIVE_SHIFT) & 0xFFFFFFFF))
        out_slabT_ref[pl.ds(i, 1), :] = jnp.transpose(out_entry)

        live = live + jnp.where(active, length, 0)
        since = since + jnp.where(in_repair, 1, 0)
        return (probs, ctx, dists, live, hi, lo, since, rctx, rdists, rlive)

    (probs, ctx, dists, live, hi, lo, since, rctx, rdists, rlive) = (
        jax.lax.fori_loop(0, n, body, carry0))

    probs_ref[:] = probs
    misc_ref[0:1, :] = jnp.transpose(hi)
    misc_ref[1:2, :] = jnp.transpose(lo)
    misc_ref[2:3, :] = jnp.transpose(rctx)
    misc_ref[3:4, :] = jnp.transpose(rlive)
    for js in range(4):
        misc_ref[4 + js:5 + js, :] = jnp.transpose(rdists[js])


def pack_data_words(data: np.ndarray) -> np.ndarray:
    """int32[1, ceil(n/4) padded to 128] little-endian packed bytes."""
    n = len(data)
    n4 = -(-max(n, 1) // 4)
    n4p = -(-n4 // 128) * 128
    buf = np.zeros(n4p * 4, np.uint8)
    buf[:n] = data
    words = (buf[0::4].astype(np.uint32)
             | (buf[1::4].astype(np.uint32) << 8)
             | (buf[2::4].astype(np.uint32) << 16)
             | (buf[3::4].astype(np.uint32) << 24))
    return words.astype(np.int64).astype(np.int32).reshape(1, n4p)


@functools.partial(jax.jit, static_argnames=("cb", "interpret"))
def repair_cost_pallas(slabs, q, u, data, data_packed, cand_dist, cand_len,
                       corr, cb: int = 256, interpret: bool = False):
    """Drop-in fused pass with the same contract as
    repair_scan.repair_cost_batched (log2 arg replaced by the packed
    corr table; data_packed from pack_data_words).

    slabs uint32[C, n]; q, u int32[C]; C must be a multiple of 8.
    Chain blocks of `cb` run as sequential grid steps (compute-bound).
    """
    C, n = slabs.shape
    M = cand_dist.shape[1]
    n4 = data_packed.shape[1]
    cb = min(cb, C)
    assert C % cb == 0 and cb % 8 == 0, (C, cb)
    grid = C // cb

    qu = jnp.stack([q.astype(jnp.int32), u.astype(jnp.int32)])   # [2, C]
    slabT = jnp.transpose(slabs)                                 # [n, C]

    kern = functools.partial(_kernel, n=n, n4=n4, M=M, CB=cb)
    out_slabT, probs, misc = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n, cb), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cb), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n4), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, M), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, M), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, cb), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, P_PAD), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cb), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, C), jnp.uint32),
            jax.ShapeDtypeStruct((C, P_PAD), jnp.int32),
            jax.ShapeDtypeStruct((8, C), jnp.int32),
        ],
        interpret=interpret,
    )(slabT, qu, data.astype(jnp.int32), data_packed, cand_dist,
      cand_len, corr)

    rdists = jnp.transpose(misc[4:8, :])
    return (jnp.transpose(out_slabT), misc[0], misc[1], probs,
            misc[2], rdists, misc[3])
