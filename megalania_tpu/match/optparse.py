"""Price-driven optimal-parse initializer (xz-class shortest path).

The reference can only seed annealing from the all-literals parse
(/root/reference/src/packet_slab.c:30-32); this framework adds a greedy
longest-match seed (candidates.greedy_slab) and, here, a near-optimal
seed: dynamic programming over the dense candidate table with LZMA
*price tables* derived from trained probabilities — the approach of
xz's optimum encoder, re-derived for the vectorized candidate-table
representation (not a translation; xz prices per coder state during a
forward pass, we use a 2-bucket arrival-context DP with static trained
prices and a price-feedback iteration).

Why it matters: measured on a 64 KiB text block, annealing from the
greedy seed converges ~8%% behind `xz -9e` even at the full reference
budget — the stochastic search cannot discover xz-class parse structure
at that scale.  Seeding at xz-class quality turns the annealer into a
strict refiner.

Pipeline (build_optimal_slab):
  1. DP with fresh-model prices (every adaptive bit = 1 bit exactly,
     since every probability starts at PROB_INIT);
  2. cost the resulting parse exactly with the python oracle encoder,
     which trains the adaptive model along the parse;
  3. re-run the DP with prices from the trained model (optionally
     iterate).

The DP is BACKWARD (dp[i] = cheapest suffix parse from i) so each
position takes a pure vectorized min over its outgoing edges — no
scatter, and the forward backtrack is trivially correct.  Nodes carry a
2-value arrival context (after-literal ~ ctx_state 0-3, after-match ~
7-11) to price the is_match/is_rep header bits with the right slots.
Rep packets are not priced (the annealer introduces them afterwards).
"""
from __future__ import annotations

import numpy as np

from ..ops import tables as T
from . import candidates as C_

_LOG2 = T.LOG2_TABLE_NP        # int64[2048], cost of prob value, bit=0


def _bit_cost(p, bit):
    """Fixed-point cost (bits << 11) of coding `bit` against prob p."""
    return np.where(bit, _LOG2[T.PROB_ONE - p], _LOG2[p])


def _tree_prices(probs, base, nbits, nvals):
    """[nvals] price of coding v through an MSB-first bit tree at base."""
    v = np.arange(nvals, dtype=np.int64)
    cost = np.zeros(nvals, np.int64)
    m = np.ones(nvals, np.int64)
    for j in range(nbits - 1, -1, -1):
        bit = (v >> j) & 1
        cost += _bit_cost(probs[base + m], bit)
        m = (m << 1) | bit
    return cost


def _rev_prices_for(probs, base, nbits, values):
    """Price of LSB-first reverse-tree coding of each value (vector)."""
    cost = np.zeros(len(values), np.int64)
    m = np.ones(len(values), np.int64)
    v = np.asarray(values, np.int64)
    for _ in range(nbits):
        bit = v & 1
        v >>= 1
        cost += _bit_cost(probs[base + m], bit)
        m = (m << 1) | bit
    return cost


def _len_prices(probs, base):
    """[272] price of len2 = length - 2 through the length coder."""
    out = np.zeros(272, np.int64)
    c1 = probs[base + T.LEN_CHOICE1]
    c2 = probs[base + T.LEN_CHOICE2]
    low = _tree_prices(probs, base + T.LEN_LOW, 3, 8)
    mid = _tree_prices(probs, base + T.LEN_MID, 3, 8)
    high = _tree_prices(probs, base + T.LEN_HIGH, 8, 256)
    out[:8] = _bit_cost(c1, 0) + low
    out[8:16] = _bit_cost(c1, 1) + _bit_cost(c2, 0) + mid
    out[16:] = _bit_cost(c1, 1) + _bit_cost(c2, 1) + high[:256]
    return out


def _lit_prices(probs, data, lc: int = 0):
    """[n] price of each data byte as a (non-matched-mode) literal."""
    byte_tab = np.zeros((1 << lc, 256), np.int64)
    for ctx in range(1 << lc):
        base = T.LIT + ctx * 0x300
        b = np.arange(256, dtype=np.int64)
        cost = np.zeros(256, np.int64)
        sym = np.ones(256, np.int64)
        for j in range(7, -1, -1):
            bit = (b >> j) & 1
            cost += _bit_cost(probs[base + sym], bit)
            sym = (sym << 1) | bit
        byte_tab[ctx] = cost
    if lc:
        prev = np.concatenate([[0], data[:-1].astype(np.int64)])
        return byte_tab[prev >> (8 - lc), data]
    return byte_tab[0, data]


# arrival-context buckets: ctx_state after a literal (0..3 -> slot 0)
# and after a match (7..10 -> slot 7)
_KS = (0, 7)


def _dist_prices(probs, dists):
    """[len(dists), 4] price of each stored-form distance per len-ctx."""
    d = np.asarray(dists, np.int64)
    bl = np.zeros(len(d), np.int64)
    dd = d.copy()
    while (dd > 0).any():
        bl = np.where(dd > 0, bl + 1, bl)
        dd >>= 1
    nlb_t = np.maximum(bl - 2, 0)
    high = d >> nlb_t
    ps = np.where(d < 4, d, nlb_t * 2 + high)

    slot = np.stack([
        _tree_prices(probs, T.DIST_SLOT + 64 * c, 6, 64)[ps]
        for c in range(4)
    ], axis=1)                                            # [K, 4]

    tail = np.zeros(len(d), np.int64)
    mid = (ps >= 4) & (ps < 14)
    if mid.any():
        # group by pos slot: same nlb and tree base per slot value
        for s in np.unique(ps[mid]):
            sel = ps == s
            nlb = (int(s) >> 1) - 1
            hi2 = 2 | (int(s) & 1)
            base = T.POS_CODER + (hi2 << nlb) - int(s)
            low = d[sel] & ((1 << nlb) - 1)
            tail[sel] = _rev_prices_for(probs, base, nlb, low)
    big = ps >= 14
    if big.any():
        nlb = nlb_t[big]
        tail[big] = ((nlb - 4) << T.PROB_BITS) + _rev_prices_for(
            probs, T.ALIGN, 4, d[big] & 15)
    return slot + tail[:, None]


def _parse_dp(data, tab: C_.CandidateTable, probs, lc: int = 0,
              sublens: int = 8, rep_d=None, rep_len=None):
    """One backward DP + forward backtrack -> packed uint32 slab.

    rep_d/rep_len (optional [n, 4]): candidate REP distances per
    position (0 = none) with their LCE-verified extensions, derived by
    the caller from the previous iteration's parse — the xz-style rep
    candidates the memory-less DP cannot discover itself.  The
    backtrack emits them as explicit MATCH packets; _rep_promote then
    assigns true rep indices along the real stack walk, so validity
    never depends on the approximated stacks."""
    from ..models import packets as P

    n = len(data)
    slab = np.asarray(P.literal_slab(n)).copy()
    if n < 2:
        return slab

    litp = _lit_prices(probs, data, lc)                  # [n]
    lenp = _len_prices(probs, T.LEN)                     # [272]
    m0 = np.array([_bit_cost(probs[T.IS_MATCH + (k << T.POS_BITS_MAX)], 0)
                   for k in _KS])                        # [2] lit header
    m1 = np.array([
        _bit_cost(probs[T.IS_MATCH + (k << T.POS_BITS_MAX)], 1)
        + _bit_cost(probs[T.IS_REP + k], 0) for k in _KS])  # [2] match hdr
    # rep header price (is_match=1, is_rep=1, index bits for slot 0..3;
    # slot 0 with len>1 also codes is_rep0_long=1)
    lenp_rep = _len_prices(probs, T.REP_LEN)
    rep_hdr = np.zeros((2, 4), np.int64)
    for ki, k in enumerate(_KS):
        ism = (_bit_cost(probs[T.IS_MATCH + (k << T.POS_BITS_MAX)], 1)
               + _bit_cost(probs[T.IS_REP + k], 1))
        g0, g1, g2 = (probs[T.IS_REP_G0 + k], probs[T.IS_REP_G1 + k],
                      probs[T.IS_REP_G2 + k])
        r0l = probs[T.IS_REP0_LONG + (k << T.POS_BITS_MAX)]
        rep_hdr[ki, 0] = ism + _bit_cost(g0, 0) + _bit_cost(r0l, 1)
        rep_hdr[ki, 1] = ism + _bit_cost(g0, 1) + _bit_cost(g1, 0)
        rep_hdr[ki, 2] = (ism + _bit_cost(g0, 1) + _bit_cost(g1, 1)
                          + _bit_cost(g2, 0))
        rep_hdr[ki, 3] = (ism + _bit_cost(g0, 1) + _bit_cost(g1, 1)
                          + _bit_cost(g2, 1))

    # per-(position, candidate): length spread points (xz prices every
    # length; bracket edges + near-max cover the optima in practice)
    L = np.asarray(tab.length, np.int64)                 # [n, M]
    D = np.asarray(tab.dist, np.int64)
    cap = np.minimum(L, (n - np.arange(n))[:, None])
    gens = [cap, cap - 1, cap - 2, np.minimum(cap, 17), np.minimum(cap, 9),
            np.full_like(cap, 2), np.full_like(cap, 3), cap - 3,
            np.minimum(cap, 5), cap // 2]
    lens = np.stack(gens[:sublens], axis=2)              # [n, M, S]
    valid = (L >= 2)[:, :, None] & (lens >= 2) & (lens <= cap[:, :, None])

    dp_m = _dist_prices(probs, D.ravel()).reshape(n, tab.dist.shape[1], 4)
    lctx = np.clip(lens - 2, 0, 3)     # invalid lens are masked below
    price = (lenp[np.clip(lens - 2, 0, 271)]
             + np.take_along_axis(dp_m, lctx, axis=2))   # [n, M, S]

    INF = np.int64(1) << 50
    price = np.where(valid, price, INF)
    lens_flat = lens.reshape(n, -1)
    price_flat = price.reshape(n, -1)

    have_rep = rep_d is not None
    if have_rep:
        RD = np.asarray(rep_d, np.int64)                 # [n, 4] stored
        RL = np.asarray(rep_len, np.int64)
        capr = np.minimum(RL, (n - np.arange(n))[:, None])
        rgens = [capr, capr - 1, np.minimum(capr, 17),
                 np.minimum(capr, 9), np.full_like(capr, 2)]
        rlens = np.stack(rgens, axis=2)                  # [n, 4, Sr]
        rvalid = ((RD > 0)[:, :, None]
                  & (RD[:, :, None] <= np.arange(n)[:, None, None] - 1)
                  & (rlens >= 2) & (rlens <= capr[:, :, None]))
        rbase = lenp_rep[np.clip(rlens - 2, 0, 271)]
        rp = [np.where(rvalid, rbase + rep_hdr[ki][None, :, None], INF)
              .reshape(n, -1) for ki in range(2)]
        rlens_flat = rlens.reshape(n, -1)
        rdist_flat = np.broadcast_to(RD[:, :, None],
                                     rlens.shape).reshape(n, -1)

    dp = np.full((n + 1, 2), INF, np.int64)
    dp[n] = 0
    # backward: dp[i, k] = best of literal / matches given arrival ctx k
    for i in range(n - 1, -1, -1):
        tgt = np.minimum(i + lens_flat[i], n)
        suffix = dp[tgt, 1]                              # match -> k'=1
        mbest = (price_flat[i] + suffix).min()
        litc = litp[i] + dp[i + 1, 0]
        v0 = min(litc + m0[0], mbest + m1[0])
        v1 = min(litc + m0[1], mbest + m1[1])
        if have_rep:
            rsuf = dp[np.minimum(i + rlens_flat[i], n), 1]
            v0 = min(v0, (rp[0][i] + rsuf).min())
            v1 = min(v1, (rp[1][i] + rsuf).min())
        dp[i, 0] = v0
        dp[i, 1] = v1

    # forward backtrack (rep choices emit explicit MATCH packets; the
    # caller's _rep_promote pass assigns true rep indices)
    i, k = 0, 0
    while i < n:
        litc = litp[i] + dp[i + 1, 0] + m0[k]
        tgt = np.minimum(i + lens_flat[i], n)
        cand = price_flat[i] + dp[tgt, 1] + m1[k]
        j = int(np.argmin(cand))
        best_c, best_len, best_d = cand[j], int(lens_flat[i][j]), int(
            D[i, j // lens.shape[2]])
        if have_rep:
            rcand = rp[k][i] + dp[np.minimum(i + rlens_flat[i], n), 1]
            jr = int(np.argmin(rcand))
            if rcand[jr] < best_c:
                best_c = rcand[jr]
                best_len = int(rlens_flat[i][jr])
                best_d = int(rdist_flat[i][jr])
        if litc <= best_c:
            i += 1
            k = 0
            continue
        slab[i] = P.pack_np(P.MATCH, best_d, best_len)
        i += best_len
        k = 1
    return slab


def _rep_promote(data, slab):
    """Rewrite MATCH packets whose distance sits in the live rep stack
    as LONG_REP packets (and literals equal to the rep0 byte as
    SHORT_REPs) — the identical byte structure, strictly cheaper
    encoding (a rep index costs ~4-10 bits where a full distance costs
    ~6-30).  The DP above cannot price reps (the stack is path-
    dependent); this linear pass recovers the common wins, and the
    annealer refines the rest."""
    from ..models import packets as P

    ptype, dist, length, _ = P.unpack_np(slab)
    out = slab.copy()
    dists = [0, 0, 0, 0]
    pos, n = 0, len(slab)
    while pos < n:
        t, d, ln = int(ptype[pos]), int(dist[pos]), int(length[pos])
        if t == P.MATCH:
            if d in dists:
                k = dists.index(d)
                out[pos] = P.pack_np(P.LREP, k, ln)
                dists.insert(0, dists.pop(k))
            else:
                dists = [d] + dists[:3]
        elif t == P.LIT:
            mb = pos - dists[0] - 1
            if mb >= 0 and data[mb] == data[pos]:
                out[pos] = P.pack_np(P.SREP, 0, 1)
        elif t == P.LREP:
            dists.insert(0, dists.pop(min(d, 3)))
        pos += ln
    return out


def _rep_candidates(data, slab, index):
    """[n,4] rep-stack distances along the parse + LCE extensions.

    The stacks are those of the GIVEN parse — the next DP iteration may
    choose differently, so they are candidate proposals only; validity
    of the emitted packets never depends on them (explicit distances,
    see _parse_dp backtrack)."""
    from ..models import packets as P
    from .suffix import lce_np

    n = len(slab)
    rep_d = np.zeros((n, 4), np.int64)
    ptype, dist, length, _ = P.unpack_np(slab)
    dists = [0, 0, 0, 0]
    pos = 0
    while pos < n:
        t, d, ln = int(ptype[pos]), int(dist[pos]), int(length[pos])
        rep_d[pos:pos + ln] = dists
        if t == P.MATCH:
            if d in dists:
                dists.insert(0, dists.pop(dists.index(d)))
            else:
                dists = [d] + dists[:3]
        elif t == P.LREP:
            dists.insert(0, dists.pop(min(d, 3)))
        pos += ln
    rep_len = np.zeros((n, 4), np.int64)
    pos_all = np.arange(n, dtype=np.int64)
    for r in range(4):
        src = pos_all - rep_d[:, r] - 1
        ok = (rep_d[:, r] > 0) & (src >= 0)
        if ok.any():
            rep_len[ok, r] = np.minimum(
                lce_np(index, pos_all[ok], src[ok]), T.MATCH_LEN_MAX)
    return rep_d, rep_len


def build_optimal_slab_native(data, tab: C_.CandidateTable, lc: int = 0,
                              passes: int = 4, win_size: int = 8192,
                              index=None, wide: bool = False):
    """xz-class optimum-parse seed via the native Viterbi engine.

    Each pass parses with STATIC price tables snapshotted every
    win_size bytes from the previous parse's exact adaptive model
    (window w's prices = the model state entering position w*win_size),
    so prices track the coder's actual evolution through the block —
    the "settle at window edges" rule.  The Viterbi nodes carry the
    exact ctx_state and the best arrival's rep stack, and every
    candidate length 2..273 is relaxed (dense enumeration, the
    reference's semantics, substring_enumerator.c:85-105).  The parse
    with the cheapest EXACT adaptive cost across passes wins.
    """
    from . import optparse_native as on

    from ..models import packets as P

    data = np.frombuffer(bytes(data), np.uint8) if isinstance(
        data, (bytes, bytearray)) else np.asarray(data, np.uint8)
    n = len(data)
    if n == 0:
        empty = np.asarray(P.literal_slab(0))
        return (empty, np.zeros(0, np.uint32)) if wide else empty
    if index is None:
        from .suffix import build_lce
        index = build_lce(data)
    # win_size=0: sweep the measured-good snapshot windows and keep the
    # exact-cost best — the per-input optimum window varies (binary
    # favored 256, text 512/1024; up to 28 B spread at n=2048)
    wins = ((256, 512, 1024) if win_size == 0
            else (win_size,))
    wins = sorted({max(256, min(w, max(n, 1))) for w in wins})

    def parse(pw, ws):
        out = on.viterbi_parse(data, pw, tab.dist, tab.length,
                               index.rank, index.sparse, lc=lc,
                               win_size=ws, wide=wide)
        return out if wide else (out, None)

    fresh = T.init_probs_np(lc=lc)[None, :]
    first, first_dw = parse(fresh, 0)
    best, best_cost = (first, first_dw), None
    for win in wins:
        nwin = -(-n // win)
        slab, dw = first, first_dw
        for _ in range(max(0, passes - 1)):
            cost, _, snaps = on.cost_train(data, slab, lc=lc, nwin=nwin,
                                           win_size=win, dists=dw)
            if best_cost is None or cost < best_cost:
                best, best_cost = (slab, dw), cost
            slab, dw = parse(snaps, win)
        cost, _ = on.cost_train(data, slab, lc=lc, dists=dw)
        if best_cost is None or cost < best_cost:
            best, best_cost = (slab, dw), cost
    slab, dw = best
    return (slab, dw) if wide else slab


def seed_slab(data, cfg, index=None, wide: bool = False):
    """Config-driven optimum-parse seed — the single builder behind
    both engine.make_context (device pipeline) and the compressor's
    DP-only mode, so their seeds can never drift.

    Returns (slab, dists); dists is None on the packed path.  Falls
    back to the numpy DP (or raises, for wide blocks) when the native
    library is unavailable."""
    data = np.frombuffer(bytes(data), np.uint8) if isinstance(
        data, (bytes, bytearray)) else np.asarray(data, np.uint8)
    if index is None:
        from .suffix import build_lce
        index = build_lce(data)
    try:
        from . import optparse_native as on
        native = on.available()
    except Exception:  # noqa: BLE001 — no toolchain
        native = False
    if native:
        tab = C_.build_candidates(data, cfg.opt_candidates,
                                  cfg.opt_walk, index)
        out = build_optimal_slab_native(
            data, tab, lc=cfg.lc, passes=cfg.opt_passes,
            win_size=cfg.opt_window, index=index, wide=wide)
        return out if wide else (out, None)
    if wide:
        raise RuntimeError(
            "wide (> 1 MiB) blocks need the native optparse library "
            "(no C++ toolchain available)")
    tab = C_.build_candidates(data, cfg.max_candidates, cfg.max_walk,
                              index)
    return build_optimal_slab(data, tab, lc=cfg.lc, index=index), None


def build_optimal_slab(data, tab: C_.CandidateTable, lc: int = 0,
                       passes: int = 2, sublens: int = 8,
                       index=None) -> np.ndarray:
    """Optimal-parse seed: DP with fresh prices, then price-feedback
    iterations using the exactly-trained model of the previous parse.

    Dispatches to the native rep-aware Viterbi engine when the C++
    library is available (strictly stronger and ~1000x faster); this
    numpy path remains as the no-toolchain fallback and as the
    reference implementation for the 2-bucket DP."""
    from ..runtime import pyemit

    try:
        from . import optparse_native as on
        if on.available():
            return build_optimal_slab_native(
                data, tab, lc=lc, passes=max(8, passes + 2),
                win_size=0, index=index)
    except Exception:  # noqa: BLE001 — fall back to the numpy DP
        pass

    data = np.frombuffer(bytes(data), np.uint8) if isinstance(
        data, (bytes, bytearray)) else np.asarray(data, np.uint8)
    raw = data.tobytes()

    def exact(sl):
        enc = pyemit.Encoder(raw, pyemit.CostSink(), lc=lc)
        for _, t, d, ln in pyemit.walk_slab(sl):
            enc.encode_packet(t, d, ln)
        return enc.sink.perplexity, enc.probs

    probs = T.init_probs_np(lc=lc)
    slab = _rep_promote(data, _parse_dp(data, tab, probs, lc, sublens))
    best, best_cost = slab, None
    for _ in range(max(0, passes - 1)):
        cost, trained = exact(slab)
        if best_cost is None or cost < best_cost:
            best, best_cost = slab, cost
        if index is not None:
            rep_d, rep_len = _rep_candidates(data, slab, index)
        else:
            rep_d = rep_len = None
        slab = _rep_promote(data, _parse_dp(data, tab, trained, lc,
                                            sublens, rep_d, rep_len))
    # keep whichever parse the exact model says is cheapest
    cost, _ = exact(slab)
    if best_cost is not None and best_cost < cost:
        return best
    return slab
