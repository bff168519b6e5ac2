"""Fused repair+cost pass: class-decomposed probability model.

Same contract and bit-exact semantics as ops/repair_scan.py (the golden
lax.scan implementation); the difference is the realization of the
per-bit gather/adapt/scatter.  A retired v1 kernel kept the probs as one
[CB, 1920] vector per chain, so every one of the ~26 bit slots per
position paid a compare+select+reduce over ALL 1920 lanes — >95% of its
kernel time.  Here instead:

  v2: per-chain values ride [1, CB] (chains on lanes); the probability
      model is split into small per-slot classes stored [rows, CB]
      (ops/problayout.py).  A slot's gather/scatter touches only its
      class' ceil(rows/8) sublane groups.  Bit trees are decomposed by
      level so a tree slot addresses a 2^level-wide class.  Literal
      probabilities exploit that the symbol-tree index is shared across
      chains (the data byte is common): each literal bit reads the 3
      candidate rows (plain / matched-0 / matched-1) by *scalar* row
      index and selects per chain — no wide ops at all.

Shared-table lookups (log2 correction words, packed data words for the
rep0 match byte) use the one dynamic-gather shape Mosaic supports
([rows, 128] lane-local take_along) via a [1, CB] -> [CB/128, 128]
reshape.

Reference unit of work: one full exact re-cost per chain per call
(/root/reference/src/packet_slab_neighbour.c:154-173).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tables as T
from . import problayout as PL
from ..models import packets as P

PROB_ONE = T.PROB_ONE
INV_PROB_ONE = 1.0 / PROB_ONE
ROW = PL.ROW
ROWS = PL.ROWS
PACKED_ROWS = PL.PACKED_ROWS


# ---------------------------------------------------------------------------
# Exact log2: float32 + packed correction (shared with ops/pallas_rank.py)
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


def rt_offset_table() -> np.ndarray:
    """[1, 128] shared table: entry 16*level + tree_id = within-class
    offset of that reverse tree at that level (problayout.RT_OFFSETS)."""
    t = np.zeros((1, 128), np.int32)
    for lvl in range(5):
        t[0, 16 * lvl:16 * lvl + 11] = PL.RT_OFFSETS[lvl]
    return t


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------

def _shared_lookup(vals, table, CB):
    """Gather table[0, vals] for [1, CB] vals from a [1, 128] table.

    Mosaic's gather lowering rejects a single-sublane (1, 128)
    take_along_axis (tools/micro_mosaic_probe4.py) — pad the row axis to
    2 and keep row 0.  Broadcasting a full (un-sliced) [1, 128] buffer
    is fine on chip (verified at rows 2 and 4); broadcasting *slices* is
    not — wide tables go through _shared_lookup_wide instead."""
    if CB % 128 != 0:            # interpret-mode path (tiny test shapes)
        return jnp.take(table[0], vals[0], axis=0)[None, :]
    cols = CB // 128
    rows = max(cols, 2)
    idx = vals.reshape(cols, 128)
    if cols < rows:
        idx = jnp.broadcast_to(idx, (rows, 128))
    tab = jnp.broadcast_to(table, (rows, 128))
    g = jnp.take_along_axis(tab, idx, axis=1)
    return g[:cols, :].reshape(1, CB)


def _shared_lookup_wide(vals, wtab, CB):
    """Gather from a wide shared table stored [R, 128] (row r holds
    entries [128r, 128r+128)); vals in [0, 128*R).

    One lane-local take_along per 128-lane value group + a masked
    row-sum to pick each value's row — no sliced-table broadcasts."""
    R = wtab.shape[0]
    if CB % 128 != 0:            # interpret-mode path
        return jnp.take(wtab.reshape(-1), vals[0], axis=0)[None, :]
    cols = CB // 128
    lo = (vals & 127).reshape(cols, 128)
    hi = (vals >> 7).reshape(cols, 128)
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    outs = []
    for c in range(cols):
        idx = jnp.broadcast_to(lo[c:c + 1, :], (R, 128))
        g = jnp.take_along_axis(wtab, idx, axis=1)
        sel = ri == hi[c:c + 1, :]
        outs.append(jnp.sum(jnp.where(sel, g, 0), axis=0, keepdims=True))
    if cols == 1:
        return outs[0]
    return jnp.concatenate(outs, axis=0).reshape(1, CB)


def _shared_lookup_batch(vals, table, CB):
    """Gather table[0, vals] for [S, CB] vals from a [1, 128] table in
    ONE lane-local take_along (vs S separate _shared_lookup calls, each
    paying its own reshape/relayout)."""
    S = vals.shape[0]
    if CB % 128 != 0:            # interpret-mode path (tiny test shapes)
        return jnp.take(table[0], vals.reshape(-1),
                        axis=0).reshape(S, CB)
    rows = S * (CB // 128)
    idx = vals.reshape(rows, 128)
    tab = jnp.broadcast_to(table, (rows, 128))
    g = jnp.take_along_axis(tab, idx, axis=1)
    return g.reshape(S, CB)


def _cls_gather(s_ref, name, idx, CB):
    """Masked row-sum gather from class `name`; idx [1, CB] within-class.

    Out-of-range idx (inactive slots) simply matches no row -> p = 0,
    which downstream clipping and the act mask make harmless."""
    row0, rows = ROW[name], ROWS[name]
    t = s_ref[row0:row0 + rows, :]
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, CB), 0)
    m = ri == idx
    p = jnp.sum(jnp.where(m, t, 0), axis=0, keepdims=True)
    return p, m, t


def _bit_length(d):
    """32 - clz(d) for 0 <= d < 2**20 via the float32 exponent (exact)."""
    e = (jax.lax.bitcast_convert_type(d.astype(jnp.float32), jnp.int32)
         >> 23) - 126
    return jnp.maximum(e, 0)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _kernel(slabT_ref, qu_ref, sc_ref, data_ref, dprev_ref, dpk_ref,
            cand_d_ref, cand_l_ref, corrw_ref, rtoff_ref, probs_in_ref,
            carry_in_ref, out_slabT_ref, snapP_ref, misc_ref,
            s_ref, carry_ref, *, n, R, M, CB, TILE, BK, SITE,
            FB, LC):
    """Grid = (chain_block, position_tile).  The probability state
    (s_ref) and the 16-row scan carry (carry_ref) persist in VMEM
    scratch across the position tiles of one chain block; tiled inputs
    (slab, candidate tables, data) are auto-pipelined HBM->VMEM by the
    grid, so blocks far larger than VMEM stream through (the 64 KiB
    design point, config.block_size).

    Partial re-cost: tiles below sc_ref[0,0] (the start tile) copy the
    slab through untouched; the walk initializes its coder state at the
    start tile from probs_in/carry_in (a snapshot captured by an earlier
    pass).  At the start of tile sc_ref[0,1] the full coder state is
    captured into snapP/misc[16:32]; cap == n_tiles captures the final
    state instead (the historical "final probs" contract).

    Per position, every adaptive-bit slot's (prob, bit, active) is
    collected first and the exact cost math (f32 log2 + packed
    correction + adaptation) runs ONCE on the stacked [NSLOT, CB]
    tensor — one correction take_along instead of ~34, one clip/log2
    chain instead of ~34 (the round-3 op-count lever; the per-slot form
    measured ~40% of slot cost in arithmetic+lookup)."""
    pt = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    start_tile = sc_ref[0, 0]
    cap_tile = sc_ref[0, 1]          # contract: cap_tile >= start_tile
    q = qu_ref[0:1, :]                                        # [1, CB]
    u = qu_ref[1:2, :]
    mpos = qu_ref[2:3, :]      # mutation site (-2: no substitution)
    m0 = qu_ref[3:4, :].astype(jnp.uint32)   # cell value at mpos
    m1 = qu_ref[4:5, :].astype(jnp.uint32)   # cell value at mpos+1
    corrw = corrw_ref[:]                                      # [1, 128]
    rtoff = rtoff_ref[:]                                      # [1, 128]
    dpk = dpk_ref[:]                                          # [R, 128]

    @pl.when(pt == start_tile)
    def _():
        s_ref[:] = probs_in_ref[:]
        carry_ref[:] = carry_in_ref[:]

    @pl.when(pt == cap_tile)
    def _():
        # state *entering* this tile's first position (post-init above
        # when cap == start, i.e. the snapshot itself).  Row 8 (`since`)
        # is pass-relative and stored as 0 — the value any later pass,
        # whose q is >= the capture point by contract, would have here.
        snapP_ref[:] = s_ref[:]
        misc_ref[16:32, :] = carry_ref[:]
        misc_ref[24:25, :] = jnp.zeros((1, CB), jnp.int32)

    @pl.when(pt < start_tile)
    def _():
        out_slabT_ref[:] = slabT_ref[:]

    def body(ii, _):
        i = pt * TILE + ii                                     # global pos

        entry = slabT_ref[pl.ds(ii, 1), :].astype(jnp.uint32)  # [1, CB]
        # in-stream mutation substitution (engine fused path; mpos=-2
        # when the caller pre-applied the mutation to the slab — NOT -1,
        # which would alias mpos+1 onto position 0)
        entry = jnp.where(mpos == i, m0,
                          jnp.where(mpos + 1 == i, m1, entry))

        # scan state lives in carry_ref rows (not fori values) so dead
        # positions/tiles can be predicated off wholesale with pl.when.
        ctx = carry_ref[0:1, :]
        d0 = carry_ref[1:2, :]
        d1 = carry_ref[2:3, :]
        d2 = carry_ref[3:4, :]
        d3 = carry_ref[4:5, :]
        live = carry_ref[5:6, :]
        pord = carry_ref[15:16, :]

        active = (live == i) & (i < n)
        nact = jnp.max(jnp.where(active, 1, 0))

        # site recording (cheap; byte mode fires on exactly one i per u)
        if SITE == "packet":
            at_u = (pord == u) & active
        else:
            at_u = u == i

        @pl.when(jnp.max(jnp.where(at_u, 1, 0)) > 0)
        def _():
            carry_ref[9:10, :] = jnp.where(at_u, ctx, carry_ref[9:10, :])
            carry_ref[10:11, :] = jnp.where(at_u, d0, carry_ref[10:11, :])
            carry_ref[11:12, :] = jnp.where(at_u, d1, carry_ref[11:12, :])
            carry_ref[12:13, :] = jnp.where(at_u, d2, carry_ref[12:13, :])
            carry_ref[13:14, :] = jnp.where(at_u, d3, carry_ref[13:14, :])
            carry_ref[14:15, :] = jnp.where(at_u, live,
                                            carry_ref[14:15, :])

        @pl.when(nact == 0)
        def _():
            # every lane is inside a match: dead cell, clear live bit
            out_slabT_ref[pl.ds(ii, 1), :] = (
                entry & jnp.uint32(~(1 << P.LIVE_SHIFT) & 0xFFFFFFFF))

        @pl.when(nact > 0)
        def _():
            hi = carry_ref[6:7, :]
            lo = carry_ref[7:8, :]
            since = carry_ref[8:9, :]
            # data block is BK >= TILE wide (1-D SMEM needs 1024-element
            # alignment); off0 locates this tile inside its block
            off0 = (pt * TILE) % BK
            byte = data_ref[off0 + ii]                        # scalar
            cdT = jnp.transpose(cand_d_ref[pl.ds(ii, 1), :])  # [M, 1]
            clT = jnp.transpose(cand_l_ref[pl.ds(ii, 1), :])

            ptype = ((entry >> P.TYPE_SHIFT)
                     & P.TYPE_MASK).astype(jnp.int32)
            dist = (entry & P.DIST_MASK).astype(jnp.int32)
            length = ((entry >> P.LEN_SHIFT)
                      & P.LEN_MASK).astype(jnp.int32)

            # rep0 match byte via packed-word shared gather (repair
            # rules + matched-literal context both read it)
            jpos = jnp.clip(i - d0 - 1, 0, n - 1)
            word = _shared_lookup_wide(jpos >> 2, dpk, CB)
            mb = (word >> ((jpos & 3) * 8)) & 255

            # ---- repair rules (repair_scan._repair_entry) ------------
            srep_ok = (i > 0) & (d0 + 1 <= i) & (mb == byte)
            count_ok = since < 4
            ls_type = jnp.where(srep_ok & count_ok, P.SREP,
                                jnp.where(srep_ok, ptype, P.LIT))
            valid_cols = []
            for dj in (d0, d1, d2, d3):
                hit = jnp.sum(
                    jnp.where((cdT == dj) & (clT >= length), 1, 0),
                    axis=0, keepdims=True)
                valid_cols.append(
                    jnp.where((hit > 0) & (dj + 1 <= i), 1, 0))
            cur_idx = jnp.clip(dist, 0, 3)
            cur_ok = jnp.where(
                cur_idx == 0, valid_cols[0],
                jnp.where(cur_idx == 1, valid_cols[1],
                          jnp.where(cur_idx == 2, valid_cols[2],
                                    valid_cols[3]))) > 0
            first_valid = jnp.full((1, CB), 3, jnp.int32)
            for js in (2, 1, 0):
                first_valid = jnp.where(valid_cols[js] != 0, js,
                                        first_valid)
            any_valid = (valid_cols[0] + valid_cols[1]
                         + valid_cols[2] + valid_cols[3]) > 0
            lrep_ok = cur_ok | any_valid
            lrep_idx = jnp.where(cur_ok, cur_idx, first_valid)
            fb_type = jnp.where(srep_ok & count_ok, P.SREP, P.LIT)

            is_ls = (ptype == P.LIT) | (ptype == P.SREP)
            is_lrep0 = ptype == P.LREP
            if FB == "match":
                # longest table match at i, smallest distance on ties
                # (repair_scan semantics, bit-identical)
                ml = jnp.max(clT, axis=0, keepdims=True)       # [1, 1]
                bd = jnp.min(jnp.where(clT == ml, cdT, 2**30), axis=0,
                             keepdims=True)
                flen = jnp.minimum(ml, n - i)
                use_m = is_lrep0 & ~lrep_ok & (flen >= 2)
            else:
                ml = bd = flen = jnp.zeros((1, 1), jnp.int32)
                use_m = jnp.zeros((1, CB), jnp.bool_)
            r_type = jnp.where(
                is_ls, ls_type,
                jnp.where(is_lrep0,
                          jnp.where(lrep_ok, P.LREP,
                                    jnp.where(use_m, P.MATCH, fb_type)),
                          ptype))
            r_dist = jnp.where(
                is_lrep0 & lrep_ok, lrep_idx,
                jnp.where(use_m, bd,
                          jnp.where(is_ls | is_lrep0, 0, dist)))
            r_len = jnp.where(use_m, flen,
                              jnp.where(is_lrep0 & ~lrep_ok, 1,
                                        jnp.where(is_ls, 1, length)))

            in_repair = active & (i >= q)
            ptype = jnp.where(in_repair, r_type, ptype)
            dist = jnp.where(in_repair, r_dist, dist)
            length = jnp.where(in_repair, r_len, length)

            # ---- packet field decomposition -------------------------
            is_lit = ptype == P.LIT
            is_match = ptype == P.MATCH
            is_srep = ptype == P.SREP
            is_lrep = ptype == P.LREP
            is_rep = is_srep | is_lrep

            # ---- slot collection (probs read, nothing written) -------
            # gathers: (class, idx, act) per slot, in commit order
            gath = []          # (name, idx, act)
            ps_list = []       # gathered probs [1, CB] each
            bit_list = []      # bit per slot ([1, CB] or scalar)
            act_list = []

            def slot(name, idx, bit, act):
                p, _, _ = _cls_gather(s_ref, name, idx, CB)
                gath.append((name, idx, act))
                ps_list.append(p)
                bit_list.append(bit)
                act_list.append(act)

            # header flag bits (bitplan slots 0..4)
            b3 = is_lrep & (dist != 0)
            b4 = jnp.where(b3, (dist != 1).astype(jnp.int32),
                           is_lrep.astype(jnp.int32))
            b5 = (dist != 2).astype(jnp.int32)
            slot("ismatch", ctx, (~is_lit).astype(jnp.int32), active)
            slot("isrep", ctx, is_rep.astype(jnp.int32),
                 active & ~is_lit)
            slot("g0", ctx, b3.astype(jnp.int32), active & is_rep)
            slot("g1r0l", jnp.where(b3, ctx, 12 + ctx), b4,
                 active & is_rep)
            slot("g2", ctx, b5, active & is_rep & b3 & (b4 == 1))

            # length coder (slots 5..14)
            len_active = active & (is_match | is_lrep)
            len2 = jnp.maximum(length - T.MATCH_LEN_MIN, 0)
            repc = is_lrep.astype(jnp.int32)
            c1 = (len2 >= 8).astype(jnp.int32)
            c2 = (len2 >= 16).astype(jnp.int32)
            slot("lch", repc, c1, len_active)
            slot("lch", 2 + repc, c2, len_active & (c1 == 1))
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
                slot(f"ltree{j}", idx, bit, len_active & (j < nbits))

            # distance coder (slots 15..25 + direct bits)
            act_d = active & is_match
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

            # literal bits: 3 scalar-row reads + per-lane select; their
            # cost rides the same batch, commits are scalar-row writes.
            # LC > 0: the data byte is shared by every lane, so the
            # literal context (top LC bits of the PREVIOUS byte) is a
            # SCALAR sub-table offset — lc costs two scalar ops here,
            # not a wider gather (the dprev SMEM block avoids the
            # tile-boundary read of data[i-1]).
            lit_active = active & is_lit
            L0 = ROW["lit"]
            if LC:
                prev = dprev_ref[off0 + ii]                   # scalar
                L0 = L0 + (prev >> (8 - LC)) * 0x300
            prefix_eq = jnp.ones((1, CB), jnp.int32)
            ctx_ge7 = ctx >= 7
            lit_sel = []
            lit_rows = []
            NG = len(ps_list)             # gathered-slot count
            for j in range(8):
                sym = (1 << j) | (byte >> (8 - j))            # scalar
                lbit = (byte >> (7 - j)) & 1                  # scalar
                mbit = (mb >> (7 - j)) & 1                    # [1, CB]
                matched = ctx_ge7 & (prefix_eq == 1)
                sel = jnp.where(matched, 1 + mbit, 0)
                r0 = s_ref[pl.ds(L0 + sym, 1), :]
                r1 = s_ref[pl.ds(L0 + 256 + sym, 1), :]
                r2 = s_ref[pl.ds(L0 + 512 + sym, 1), :]
                p = jnp.where(sel == 0, r0,
                              jnp.where(sel == 1, r1, r2))
                ps_list.append(p)
                bit_list.append(jnp.full((1, CB), lbit, jnp.int32))
                act_list.append(lit_active)
                lit_sel.append(sel)
                lit_rows.append((sym, r0, r1, r2))
                prefix_eq = prefix_eq * (mbit == lbit).astype(jnp.int32)

            # ---- ONE batched exact-cost + adaptation pass ------------
            # pad the slot count to a sublane multiple: Mosaic rejects
            # reshapes of non-8-aligned row counts
            while len(ps_list) % 8 != 0:
                ps_list.append(jnp.full((1, CB), 1, jnp.int32))
                bit_list.append(0)
                act_list.append(jnp.zeros((1, CB), jnp.bool_))
            S = len(ps_list)
            Pm = jnp.concatenate(ps_list, axis=0)             # [S, CB]
            Bm = jnp.concatenate(
                [jnp.broadcast_to(jnp.asarray(b, jnp.int32), (1, CB))
                 for b in bit_list], axis=0)
            # bool tensors live in mask registers, which Mosaic cannot
            # concatenate/relayout ("invalid vector register cast") —
            # widen each activity row to int32 first
            Am = jnp.concatenate(
                [a.astype(jnp.int32) for a in act_list], axis=0) == 1
            pc = jnp.clip(jnp.where(Bm == 1, PROB_ONE - Pm, Pm),
                          1, PROB_ONE - 1)
            c32 = _f32_log2_cost(pc)
            w = _shared_lookup_batch(pc >> 4, corrw, CB)
            cval = ((w >> ((pc & 15) * 2)) & 3) - 1
            cost = jnp.sum(jnp.where(Am, c32 + cval, 0), axis=0,
                           keepdims=True)
            adapted = jnp.where(
                Bm == 1, Pm - (Pm >> T.MOVE_BITS),
                Pm + ((PROB_ONE - Pm) >> T.MOVE_BITS))

            # ---- commits (disjoint rows within a position) -----------
            for k, (name, idx, act) in enumerate(gath):
                row0, rows = ROW[name], ROWS[name]
                t_ = s_ref[row0:row0 + rows, :]
                ri = jax.lax.broadcasted_iota(jnp.int32, (rows, CB), 0)
                m_ = ri == idx
                s_ref[row0:row0 + rows, :] = jnp.where(
                    m_ & act, adapted[k:k + 1, :], t_)
            for j in range(8):
                sym, r0, r1, r2 = lit_rows[j]
                aj = adapted[NG + j:NG + j + 1, :]
                sel = lit_sel[j]
                s_ref[pl.ds(L0 + sym, 1), :] = jnp.where(
                    (sel == 0) & lit_active, aj, r0)
                s_ref[pl.ds(L0 + 256 + sym, 1), :] = jnp.where(
                    (sel == 1) & lit_active, aj, r1)
                s_ref[pl.ds(L0 + 512 + sym, 1), :] = jnp.where(
                    (sel == 2) & lit_active, aj, r2)

            n_direct = jnp.where(act_d & (ps >= 14), nlb_t - 4, 0)
            cost = cost + (n_direct << T.PROB_BITS)

            lo2 = lo + cost
            hi2 = hi + (lo2 >> 16)
            lo2 = lo2 & 0xFFFF
            carry_ref[6:7, :] = hi2
            carry_ref[7:8, :] = lo2

            # ---- state transitions (models/lzma_state.py) ------------
            lit_n = jnp.where(ctx < 4, 0,
                              jnp.where(ctx < 10, ctx - 3, ctx - 6))
            mat_n = jnp.where(ctx < 7, 7, 10)
            sr_n = jnp.where(ctx < 7, 9, 11)
            lr_n = jnp.where(ctx < 7, 8, 11)
            ctx_n = jnp.where(is_lit, lit_n,
                              jnp.where(is_match, mat_n,
                                        jnp.where(is_srep, sr_n, lr_n)))
            carry_ref[0:1, :] = jnp.where(active, ctx_n, ctx)

            dk = jnp.where(dist == 0, d0,
                           jnp.where(dist == 1, d1,
                                     jnp.where(dist == 2, d2, d3)))
            upd = active & (is_match | is_lrep)
            new0 = jnp.where(is_match, dist, dk)
            carry_ref[1:2, :] = jnp.where(upd, new0, d0)
            carry_ref[2:3, :] = jnp.where(
                upd, jnp.where(is_match | (dist >= 1), d0, d1), d1)
            carry_ref[3:4, :] = jnp.where(
                upd, jnp.where(is_match | (dist >= 2), d1, d2), d2)
            carry_ref[4:5, :] = jnp.where(
                upd, jnp.where(is_match | (dist >= 3), d2, d3), d3)

            out_entry = jnp.where(
                active,
                (dist.astype(jnp.uint32) & P.DIST_MASK)
                | ((length.astype(jnp.uint32) & P.LEN_MASK)
                   << P.LEN_SHIFT)
                | ((ptype.astype(jnp.uint32) & P.TYPE_MASK)
                   << P.TYPE_SHIFT)
                | jnp.uint32(1 << P.LIVE_SHIFT),
                entry & jnp.uint32(~(1 << P.LIVE_SHIFT) & 0xFFFFFFFF))
            out_slabT_ref[pl.ds(ii, 1), :] = out_entry

            carry_ref[5:6, :] = live + jnp.where(active, length, 0)
            carry_ref[8:9, :] = since + jnp.where(in_repair, 1, 0)
            carry_ref[15:16, :] = pord + jnp.where(active, 1, 0)

        return 0

    @pl.when(pt >= start_tile)
    def _():
        # dead-tile fast path: every lane's next live packet is past
        # this tile, so no position does any coder work — emit the tile
        # as dead cells in one vector op and skip the position loop.
        # (live/hi/lo/since/pord are all unchanged through a dead tile;
        # byte-mode recording copies the constant state if u lands here.)
        t_end = (pt + 1) * TILE
        dead = jnp.min(carry_ref[5:6, :]) >= t_end

        @pl.when(dead)
        def _():
            gi = (jax.lax.broadcasted_iota(jnp.int32, (TILE, CB), 0)
                  + pt * TILE)
            ent = slabT_ref[:].astype(jnp.uint32)
            ent = jnp.where(gi == mpos, m0,
                            jnp.where(gi == mpos + 1, m1, ent))
            out_slabT_ref[:] = ent & jnp.uint32(
                ~(1 << P.LIVE_SHIFT) & 0xFFFFFFFF)
            if SITE != "packet":          # packet recording needs a
                in_t = (u >= pt * TILE) & (u < t_end)  # live packet
                for src, dst in ((0, 9), (1, 10), (2, 11), (3, 12),
                                 (4, 13), (5, 14)):
                    carry_ref[dst:dst + 1, :] = jnp.where(
                        in_t, carry_ref[src:src + 1, :],
                        carry_ref[dst:dst + 1, :])

        @pl.when(~dead)
        def _():
            jax.lax.fori_loop(0, TILE, body, 0)

        @pl.when(pt == n_tiles - 1)
        def _():
            misc_ref[0:1, :] = carry_ref[6:7, :]       # hi
            misc_ref[1:2, :] = carry_ref[7:8, :]       # lo
            misc_ref[2:3, :] = carry_ref[9:10, :]      # rctx
            misc_ref[3:4, :] = carry_ref[14:15, :]     # rlive
            misc_ref[4:8, :] = carry_ref[10:14, :]     # rd0..rd3
            misc_ref[8:9, :] = carry_ref[15:16, :]     # pord
            misc_ref[9:16, :] = jnp.zeros((7, CB), jnp.int32)

            @pl.when(cap_tile >= n_tiles)
            def _():
                # capture point past the end: final state (since -> 0)
                snapP_ref[:] = s_ref[:]
                misc_ref[16:32, :] = carry_ref[:]
                misc_ref[24:25, :] = jnp.zeros((1, CB), jnp.int32)


MAX_TILE = 2048          # positions per grid step (VMEM budget, see below)


def choose_tile(n: int, cb: int = 128, lc: int = 0) -> int:
    """Positions per grid step.  Small tiles give the partial-re-cost
    sweep finer start granularity (skipped prefix rounds down to a tile
    boundary); large tiles amortize per-grid-step overhead.  Targets
    ~8-32 tiles per block, capped by the VMEM budget: 3 probability
    buffers (in/out/scratch) are fixed cost, slab+candidate tile buffers
    scale with the tile size.

    Correctness does not require the engine's schedule tile to equal the
    kernel's: capture/start positions floor to the kernel tile
    consistently across passes (both sides of the snapshot use the same
    division), and flooring only moves them earlier, which is always
    valid."""
    env = os.environ.get("MEGALANIA_TILE")
    if env:                       # perf-probe / tuning override
        return max(1, min(int(env), MAX_TILE, n))

    def grow(budget: int) -> int:
        probs = 3 * PL.get_layout(lc).PACKED_ROWS * cb * 4
        t = 256
        while t < MAX_TILE and t * 16 < n:
            t2 = t * 2
            if probs + t2 * 16 * (cb + 16) > budget:
                break
            t = t2
        return t
    t = grow(int(os.environ.get("MEGALANIA_VMEM_BUDGET_MB", "14")) << 20)
    if -(-n // t) > 64:
        # too many grid steps starve the pipeline (measured r4: cb=512
        # n=64Ki at tile=256 is 1.8x slower than tile=512 — and that
        # shape also hit a TPU kernel fault); spend the last ~1.5 MiB of
        # VMEM head-room on a bigger tile before accepting >64 tiles
        t = max(t, grow(15500 << 10))
    return max(1, min(t, MAX_TILE, n))


@functools.partial(jax.jit, static_argnames=("cb", "interpret",
                                              "site_mode",
                                              "lrep_fallback", "lc"))
def repair_cost_pallas2(slabs, q, u, data, data_packed, cand_dist, cand_len,
                        corr, cb: int = 128, interpret: bool = False,
                        site_mode: str = "byte",
                        lrep_fallback: str = "litsrep",
                        mut0=None, mut1=None,
                        start_tile=None, cap_tile=None,
                        probs_in=None, carry_in=None, lc: int = 0):
    """Fused repair+cost kernel with the class-decomposed layout;
    contract and results identical to repair_scan.repair_cost_batched.

    mut0/mut1 (optional, uint32[C]): mutated cell values substituted
    in-stream at positions q and q+1 while the kernel walks the slab —
    equivalent to scatter-writing them into `slabs` first, without the
    XLA scatter.

    start_tile/cap_tile (optional int32 scalars) + probs_in
    [C, PACKED_ROWS] / carry_in [C, 16]: partial re-cost.  The walk
    starts at position start_tile*tile from the given snapshot (tiles
    below copy the slab through verbatim) and captures the coder state
    entering tile cap_tile into the snapshot outputs; cap_tile ==
    n_tiles captures the final state.  Positions are tile-aligned by
    construction — the engine converts positions to tiles with
    choose_tile(n).  Defaults reproduce the historical full walk:
    start 0, fresh init state, capture at the end (final probs).

    Blocks longer than choose_tile(n) positions stream through the
    kernel in position tiles (grid dim 1) with the probability state
    resident in scratch — VMEM holds one tile of slab/candidates plus
    three probability buffers (in/out/scratch), not the block."""
    C, n = slabs.shape
    M = cand_dist.shape[1]
    n4 = data_packed.shape[1]
    cb = min(cb, C)
    assert C % cb == 0 and cb % 8 == 0, (C, cb)
    if not interpret:
        assert cb % 128 == 0, f"v2 kernel needs cb%128==0 on TPU, got {cb}"
    grid = C // cb
    PROWS = PL.get_layout(lc).PACKED_ROWS   # lc only widens the lit tail

    tile = choose_tile(n, cb, lc)
    n_tiles = -(-n // tile)
    n_pad = n_tiles * tile

    if start_tile is None:
        start_tile = jnp.int32(0)
    if cap_tile is None:
        cap_tile = jnp.int32(n_tiles)
    if probs_in is None:
        probs_in = jnp.full((C, PROWS), T.PROB_INIT, jnp.int32)
    if carry_in is None:
        carry_in = jnp.zeros((C, 16), jnp.int32)
    sc = jnp.stack([jnp.asarray(start_tile, jnp.int32),
                    jnp.asarray(cap_tile, jnp.int32)]).reshape(1, 2)

    # packed data words as [R, 128] rows (row r = words 128r..128r+127);
    # _shared_lookup_wide gathers lane-locally then row-selects.
    R = max(2, -(-n4 // 128))
    dpkR = jnp.pad(data_packed, ((0, 0), (0, R * 128 - n4))).reshape(R, 128)

    if mut0 is None:
        mpos = jnp.full(C, -2, jnp.int32)   # -2: neither mpos nor mpos+1
        #      can match a position index
        m0 = jnp.zeros(C, jnp.int32)
        m1 = jnp.zeros(C, jnp.int32)
    else:
        mpos = jnp.clip(q.astype(jnp.int32), 0, n - 1)
        m0 = jax.lax.bitcast_convert_type(mut0.astype(jnp.uint32),
                                          jnp.int32)
        m1 = jax.lax.bitcast_convert_type(mut1.astype(jnp.uint32),
                                          jnp.int32)
    qu = jnp.stack([q.astype(jnp.int32), u.astype(jnp.int32),
                    mpos, m0, m1])                               # [5, C]
    slabT = jnp.pad(jnp.transpose(slabs), ((0, n_pad - n), (0, 0)))
    # data rides SMEM as a 1-D block: a (1, tile) 2-D block would break
    # the Mosaic (8, 128)-divisibility rule whenever n_tiles > 1, and
    # 1-D s32 SMEM blocks must align to XLA's 1024-element tiling
    BK = max(tile, 1024)
    n_pad_d = -(-n_pad // BK) * BK
    data1d = jnp.pad(data.astype(jnp.int32), (0, n_pad_d - n))
    # previous-byte stream for the lc literal context: dprev[i] =
    # data[i-1] (0 at i=0), so the kernel's scalar read never crosses
    # its SMEM block boundary
    dprev1d = jnp.pad(data.astype(jnp.int32)[:-1] if n else data1d[:0],
                      (1, n_pad_d - n))
    cd = jnp.pad(cand_dist, ((0, n_pad - n), (0, 0)))
    cl = jnp.pad(cand_len, ((0, n_pad - n), (0, 0)))
    rtoff = jnp.asarray(rt_offset_table())

    kern = functools.partial(_kernel, n=n, R=R, M=M, CB=cb, TILE=tile,
                             BK=BK, SITE=site_mode, FB=lrep_fallback,
                             LC=lc)
    out_slabT, snapP, misc = pl.pallas_call(
        kern,
        grid=(grid, n_tiles),
        in_specs=[
            pl.BlockSpec((tile, cb), lambda g, t: (t, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, cb), lambda g, t: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda g, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BK,), lambda g, t: ((t * tile) // BK,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BK,), lambda g, t: ((t * tile) // BK,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R, 128), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, M), lambda g, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, M), lambda g, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PROWS, cb), lambda g, t: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, cb), lambda g, t: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, cb), lambda g, t: (t, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PROWS, cb), lambda g, t: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, cb), lambda g, t: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, C), jnp.uint32),
            jax.ShapeDtypeStruct((PROWS, C), jnp.int32),
            jax.ShapeDtypeStruct((32, C), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((PROWS, cb), jnp.int32),
                        pltpu.VMEM((16, cb), jnp.int32)],
        interpret=interpret,
    )(slabT, qu, sc, data1d, dprev1d, dpkR, cd, cl, corr, rtoff,
      jnp.transpose(probs_in), jnp.transpose(carry_in))

    packed = jnp.transpose(snapP)         # [C, PACKED_ROWS] — canonical
    rdists = jnp.transpose(misc[4:8, :])
    return (jnp.transpose(out_slabT[:n, :]), misc[0], misc[1], packed,
            misc[2], rdists, misc[3], misc[8],
            jnp.transpose(misc[16:32, :]))
