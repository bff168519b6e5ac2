"""Pallas fused kernel == portable lax.scan pass, bit for bit (CPU
interpret mode; the same comparison runs on real TPU via tools/).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from megalania_tpu.anneal import engine, moves
from megalania_tpu.anneal.config import AnnealConfig
from megalania_tpu.models import packets as P
from megalania_tpu.ops import pallas_repair2, repair_scan, tables as T

DATA = (b"abra cadabra abra cadabra! abracadabra? "
        b"the rain in spain falls mainly on the plain. " * 3)[:192]
C = 8


@pytest.fixture(scope="module")
def ctx():
    cfg = AnnealConfig(chains=C, max_candidates=8, max_walk=48)
    return engine.make_context(DATA, cfg)


def _check(got, want):
    names = ("slab", "hi", "lo", "probs", "rec_ctx", "rec_dists",
             "rec_live", "live_count", "snap_carry")
    for name, g, w in zip(names, got, want):
        g, w = np.asarray(g), np.asarray(w)
        if name == "probs":
            g, w = g[:, :T.NUM_PROBS], w[:, :T.NUM_PROBS]  # pad slot differs
        np.testing.assert_array_equal(g, w, err_msg=name)


def test_engine_pallas_matches_xla(ctx):
    """Whole-engine smoke: same trajectory under both kernels."""
    cfg_x = AnnealConfig(chains=C, max_candidates=8, max_walk=48,
                         top_k=12, kernel="xla")
    cfg_p = AnnealConfig(chains=C, max_candidates=8, max_walk=48,
                         top_k=12, kernel="pallas2", chain_block=C)
    sx = engine.run_iters(engine.init_state(ctx, cfg_x), ctx, cfg_x, 12)
    sp = engine.run_iters(engine.init_state(ctx, cfg_p), ctx, cfg_p, 12)
    assert int(sx.best_hi) == int(sp.best_hi)
    assert int(sx.best_lo) == int(sp.best_lo)
    np.testing.assert_array_equal(np.asarray(sx.best_slab),
                                  np.asarray(sp.best_slab))


def _run_v2(ctx, slabs, q, u, monkeypatch=None, max_tile=None):
    corr = jnp.asarray(pallas_repair2.log2_correction(interpret=True))
    fn = pallas_repair2.repair_cost_pallas2
    if max_tile is not None:
        monkeypatch.setattr(pallas_repair2, "MAX_TILE", max_tile)
        fn = fn.__wrapped__          # skip the jit cache (MAX_TILE is free)
    got = list(fn(slabs, q, u, ctx.data, ctx.data_packed, ctx.cand_dist,
                  ctx.cand_len, corr, cb=C, interpret=True))
    from megalania_tpu.ops import problayout as PL
    got[3] = PL.flat_from_packed(got[3])   # v2 returns the packed layout
    want = repair_scan.repair_cost_batched(
        slabs, q, u, ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2,
    )
    return got, want


def _mutated_slabs(ctx, rng):
    n = ctx.data.shape[0]
    base = P.literal_slab(n)
    slabs = np.broadcast_to(base, (C, n)).copy()
    cd = np.asarray(ctx.cand_dist)
    cl = np.asarray(ctx.cand_len)
    for c in range(C):
        for _ in range(6):
            i = int(rng.integers(2, n - 4))
            m = int(rng.integers(0, cd.shape[1]))
            if cl[i, m] >= 2:
                slabs[c, i] = P.pack_np(
                    P.MATCH, cd[i, m], min(int(cl[i, m]), n - i))
            slabs[c, int(rng.integers(1, n))] = P.pack_np(
                P.LREP, int(rng.integers(0, 4)), 2)
            slabs[c, int(rng.integers(1, n))] = P.pack_np(P.SREP, 0, 1)
    n2 = n  # sites anywhere
    q = jnp.asarray(rng.integers(0, n // 2, C), jnp.int32)
    u = jnp.asarray(rng.integers(0, n2, C), jnp.int32)
    return jnp.asarray(slabs), q, u


def test_v2_parity_mutated(ctx, rng):
    slabs, q, u = _mutated_slabs(ctx, rng)
    got, want = _run_v2(ctx, slabs, q, u)
    _check(got, want)


def test_v2_inkernel_mutation_matches_scatter(ctx, rng):
    """In-stream substitution of the two mutated cells at q/q+1 ==
    scatter-writing them into the slab first, bit for bit — including
    q == n-1, where only the q cell exists."""
    n = ctx.data.shape[0]
    slabs, q, u = _mutated_slabs(ctx, rng)
    q = q.at[0].set(n - 1)                       # last-position edge case
    corr = jnp.asarray(pallas_repair2.log2_correction(interpret=True))
    mut0 = jnp.asarray(
        P.pack_np(P.SREP, np.zeros(C, np.int64), np.ones(C, np.int64)))
    mut1 = jnp.asarray(
        P.pack_np(P.LREP, rng.integers(0, 4, C), np.full(C, 2)))

    qc = jnp.clip(q, 0, n - 1)
    has_next = qc + 1 < n
    scattered = slabs.at[jnp.arange(C), qc].set(mut0)
    scattered = scattered.at[jnp.arange(C), jnp.clip(qc + 1, 0, n - 1)].set(
        jnp.where(has_next, mut1, mut0))
    want = pallas_repair2.repair_cost_pallas2(
        scattered, q, u, ctx.data, ctx.data_packed, ctx.cand_dist,
        ctx.cand_len, corr, cb=C, interpret=True)
    got = pallas_repair2.repair_cost_pallas2(
        slabs, q, u, ctx.data, ctx.data_packed, ctx.cand_dist,
        ctx.cand_len, corr, cb=C, interpret=True,
        mut0=mut0, mut1=mut1)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_v2_parity_multitile(ctx, rng, monkeypatch):
    """Position-tiled streaming (the 64 KiB design point, scaled down):
    3 tiles of 64 over n=192, state carried across tiles in scratch."""
    slabs, q, u = _mutated_slabs(ctx, rng)
    got, want = _run_v2(ctx, slabs, q, u, monkeypatch, max_tile=64)
    _check(got, want)


def test_rank_kernel_parity(ctx, rng):
    """Pallas ranking kernel == moves.rank_candidates, bit for bit."""
    import jax
    from megalania_tpu.ops import pallas_rank

    n = ctx.data.shape[0]
    slabs, q, _u = _mutated_slabs(ctx, rng)
    cfg = AnnealConfig(chains=C, max_candidates=8, max_walk=48)
    state = engine.init_state(ctx, cfg)
    ch = state.chains

    qs = jnp.asarray(rng.integers(0, n, C), jnp.int32)
    rec_ctx = jnp.asarray(rng.integers(0, 12, C), jnp.int32)
    rec_dists = jnp.asarray(
        np.sort(rng.integers(0, n - 1, (C, 4)), axis=1), jnp.int32)

    cands = jax.vmap(
        lambda s, qq, rd: moves.enumerate_candidates(
            s, qq, rd, ctx.data, ctx.rank, ctx.sparse, ctx.cand_dist,
            ctx.cand_len, ctx.cand_count))(slabs, qs, rec_dists)

    qc = jnp.clip(qs, 0, n - 1)
    byte = ctx.data[qc]
    mb = ctx.data[jnp.clip(qc - rec_dists[:, 0] - 1, 0, n - 1)]
    want = jax.vmap(
        lambda c, rp, rc, rd, b, m: moves.rank_candidates(
            c, rp, rc, rd, b, m, ctx.log2, ctx.f2p)
    )(cands, ch.rank_probs, rec_ctx, rec_dists, byte, mb)

    from megalania_tpu.models import packets as P2
    candp = P2.pack(cands.ptype, cands.dist, cands.length,
                    cands.valid.astype(jnp.int32))
    corr = jnp.asarray(pallas_repair2.log2_correction(interpret=True))
    got = pallas_rank.rank_pallas(
        ch.rank_probs, candp, rec_ctx, rec_dists, byte, mb,
        ctx.log2, ctx.f2p, corr, cb=C, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_engine_ranker_kernel_matches_xla(ctx):
    """Same trajectory whether candidates are costed by the Pallas
    ranking kernel (interpret) or by XLA gathers."""
    cfg_x = AnnealConfig(chains=C, max_candidates=8, max_walk=48,
                         top_k=12, ranker="xla")
    cfg_k = AnnealConfig(chains=C, max_candidates=8, max_walk=48,
                         top_k=12, ranker="kernel", chain_block=C)
    sx = engine.run_iters(engine.init_state(ctx, cfg_x), ctx, cfg_x, 12)
    sk = engine.run_iters(engine.init_state(ctx, cfg_k), ctx, cfg_k, 12)
    assert int(sx.best_hi) == int(sk.best_hi)
    assert int(sx.best_lo) == int(sk.best_lo)
    np.testing.assert_array_equal(np.asarray(sx.best_slab),
                                  np.asarray(sk.best_slab))


def test_v2_parity_packet_site_mode(ctx, rng):
    """site_mode='packet': ordinal site selection + live count, v2 vs
    golden scan."""
    slabs, q, _ = _mutated_slabs(ctx, rng)
    Cn = slabs.shape[0]
    u = jnp.asarray(rng.integers(0, 64, Cn), jnp.int32)  # ordinals
    corr = jnp.asarray(pallas_repair2.log2_correction(interpret=True))
    got = list(pallas_repair2.repair_cost_pallas2.__wrapped__(
        slabs, q, u, ctx.data, ctx.data_packed, ctx.cand_dist,
        ctx.cand_len, corr, cb=C, interpret=True, site_mode="packet"))
    from megalania_tpu.ops import problayout as PL
    got[3] = PL.flat_from_packed(got[3])
    want = repair_scan.repair_cost_batched(
        slabs, q, u, ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2,
        site_mode="packet")
    _check(got, want)
    assert int(np.asarray(want[7]).min()) > 0   # counts are real


def test_engine_packet_site_mode(ctx):
    """Engine smoke under the reference's uniform-over-live-packets
    site rule; output parse stays valid (cost finite, decodes)."""
    cfg = AnnealConfig(chains=C, max_candidates=8, max_walk=48,
                       top_k=12, site_mode="packet")
    s = engine.run_iters(engine.init_state(ctx, cfg), ctx, cfg, 12)
    assert int(s.best_hi) < 2**30
    assert int(s.moves_done) == 12 * C


def test_v2_parity_lrep_fallback_match(ctx, rng):
    """lrep_fallback='match' (reference-flavoured repair), v2 vs scan."""
    from megalania_tpu.ops import problayout as PL
    slabs, q, u = _mutated_slabs(ctx, rng)
    corr = jnp.asarray(pallas_repair2.log2_correction(interpret=True))
    got = list(pallas_repair2.repair_cost_pallas2.__wrapped__(
        slabs, q, u, ctx.data, ctx.data_packed, ctx.cand_dist,
        ctx.cand_len, corr, cb=C, interpret=True,
        lrep_fallback="match"))
    got[3] = PL.flat_from_packed(got[3])
    want = repair_scan.repair_cost_batched(
        slabs, q, u, ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2,
        lrep_fallback="match")
    _check(got, want)
    # the variant must actually fire on this input: some repaired
    # entries become matches where litsrep would have produced literals
    base = repair_scan.repair_cost_batched(
        slabs, q, u, ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2)
    assert not np.array_equal(np.asarray(want[0]), np.asarray(base[0]))

def test_partial_recost_parity(ctx, rng, monkeypatch):
    """Snapshot-based partial re-cost (VERDICT r2 item 1): a pass that
    starts from the snapshot captured by an earlier pass is bit-
    identical to a full walk from position 0 — kernel and golden scan,
    all nine outputs."""
    from megalania_tpu.ops import problayout as PL
    monkeypatch.setattr(pallas_repair2, "MAX_TILE", 64)
    n = ctx.data.shape[0]
    tile = pallas_repair2.choose_tile(n)
    assert tile == 64 and n == 192
    fn = pallas_repair2.repair_cost_pallas2.__wrapped__
    corr = jnp.asarray(pallas_repair2.log2_correction(interpret=True))

    slabs, q, u = _mutated_slabs(ctx, rng)
    # pass 1: full walk, capture the state entering tile 1 (pos 64)
    p1 = list(fn(slabs, q, u, ctx.data, ctx.data_packed, ctx.cand_dist,
                 ctx.cand_len, corr, cb=C, interpret=True,
                 cap_tile=jnp.int32(1)))
    w1 = repair_scan.repair_cost_batched(
        slabs, q, u, ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2,
        cap_pos=jnp.int32(64))
    np.testing.assert_array_equal(
        np.asarray(PL.flat_from_packed(p1[3]))[:, :T.NUM_PROBS],
        np.asarray(w1[3])[:, :T.NUM_PROBS], err_msg="captured probs")
    np.testing.assert_array_equal(np.asarray(p1[8]), np.asarray(w1[8]),
                                  err_msg="captured carry")

    # pass 2: mutation sites >= capture position; snapshot start == full
    q2 = jnp.asarray(rng.integers(128, n, C), jnp.int32)
    u2 = jnp.asarray(rng.integers(64, n, C), jnp.int32)
    slab1 = p1[0]
    full = list(fn(slab1, q2, u2, ctx.data, ctx.data_packed, ctx.cand_dist,
                   ctx.cand_len, corr, cb=C, interpret=True))
    part = list(fn(slab1, q2, u2, ctx.data, ctx.data_packed, ctx.cand_dist,
                   ctx.cand_len, corr, cb=C, interpret=True,
                   start_tile=jnp.int32(1), probs_in=p1[3],
                   carry_in=p1[8]))
    for g, w in zip(part, full):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    # same equivalence for the golden scan
    wfull = repair_scan.repair_cost_batched(
        slab1, q2, u2, ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2)
    wpart = repair_scan.repair_cost_batched(
        slab1, q2, u2, ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2,
        start_pos=jnp.int32(64), probs_in=w1[3], carry_in=w1[8])
    for g, w in zip(wpart, wfull):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_engine_sweep_matches_random_cost_exactness(ctx):
    """The sweep schedule produces a different trajectory than 'random'
    (different site draws) but every accepted cost stays exact: re-cost
    the final best slab from scratch and compare bit for bit."""
    cfg = AnnealConfig(chains=C, max_candidates=8, max_walk=48, top_k=12,
                       site_schedule="sweep")
    s = engine.run_iters(engine.init_state(ctx, cfg), ctx, cfg, 24)
    best = jnp.broadcast_to(s.best_slab, (C, s.best_slab.shape[0]))
    n = ctx.data.shape[0]
    out = repair_scan.repair_cost_batched(
        best, jnp.full(C, n, jnp.int32), jnp.zeros(C, jnp.int32),
        ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2)
    assert int(out[1][0]) == int(s.best_hi), (int(out[1][0]),
                                              int(s.best_hi))
    assert int(out[2][0]) == int(s.best_lo)


def test_engine_sweep_deterministic(ctx):
    """Sweep schedule: same seed -> identical best, different seed ->
    (almost surely) different trajectory."""
    cfg = AnnealConfig(chains=C, max_candidates=8, max_walk=48, top_k=12,
                       site_schedule="sweep")
    s1 = engine.run_iters(engine.init_state(ctx, cfg), ctx, cfg, 16)
    s2 = engine.run_iters(engine.init_state(ctx, cfg), ctx, cfg, 16)
    assert int(s1.best_hi) == int(s2.best_hi)
    assert int(s1.best_lo) == int(s2.best_lo)
    np.testing.assert_array_equal(np.asarray(s1.best_slab),
                                  np.asarray(s2.best_slab))


def test_dead_tile_fast_path_parity(ctx, rng, monkeypatch):
    """A tile fully covered by matches in EVERY chain takes the kernel's
    vectorized dead-tile path; results must stay bit-identical to the
    golden scan — including a mutation cell and a recording site landing
    inside the dead tile."""
    monkeypatch.setattr(pallas_repair2, "MAX_TILE", 64)
    n = ctx.data.shape[0]
    assert pallas_repair2.choose_tile(n, C) == 64
    fn = pallas_repair2.repair_cost_pallas2.__wrapped__
    corr = jnp.asarray(pallas_repair2.log2_correction(interpret=True))

    # a long match starting before tile 1 covers positions 64..128 in
    # every chain -> tile 1 is dead for all lanes
    base = np.asarray(P.literal_slab(n)).copy()
    slabs = np.broadcast_to(base, (C, n)).copy()
    # a MATCH packet passes the repair rules unchanged, so any
    # (dist, len) works for costing parity — both sides cost this slab
    start, L = 60, 70
    slabs[:, start] = P.pack_np(P.MATCH, 7, L)
    slabs = jnp.asarray(slabs)
    q = jnp.full(C, 40, jnp.int32)          # repair from before the match
    u = jnp.full(C, 90, jnp.int32)          # recording site inside tile 1
    got = list(fn(slabs, q, u, ctx.data, ctx.data_packed, ctx.cand_dist,
                  ctx.cand_len, corr, cb=C, interpret=True))
    from megalania_tpu.ops import problayout as PL
    got[3] = PL.flat_from_packed(got[3])
    want = repair_scan.repair_cost_batched(
        slabs, q, u, ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2)
    _check(got, want)
    assert int(np.asarray(want[6])[0]) in range(64, 131)  # rec_live sane


def test_v2_parity_lc3(ctx, rng):
    """lc=3 literal contexts in the kernel == the scan path, bit for bit
    (the literal context is a scalar row offset in the kernel; the scan
    threads prev_byte through the bit-plan compiler)."""
    from megalania_tpu.ops import problayout as PL

    slabs, q, u = _mutated_slabs(ctx, rng)
    corr = jnp.asarray(pallas_repair2.log2_correction(interpret=True))
    got = list(pallas_repair2.repair_cost_pallas2(
        slabs, q, u, ctx.data, ctx.data_packed, ctx.cand_dist,
        ctx.cand_len, corr, cb=C, interpret=True, lc=3))
    got[3] = PL.get_layout(3).flat_from_packed(got[3])
    want = repair_scan.repair_cost_batched(
        slabs, q, u, ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2,
        lc=3)
    names = ("slab", "hi", "lo", "probs", "rec_ctx", "rec_dists",
             "rec_live", "live_count", "snap_carry")
    for name, g, w in zip(names, got, want):
        g, w = np.asarray(g), np.asarray(w)
        if name == "probs":
            g, w = g[:, :T.num_probs(3)], w[:, :T.num_probs(3)]
        np.testing.assert_array_equal(g, w, err_msg=name)
    # and the costs really differ from the lc=0 model on this text
    want0 = repair_scan.repair_cost_batched(
        slabs, q, u, ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2)
    assert not np.array_equal(np.asarray(want[1]), np.asarray(want0[1]))


def test_engine_lc3_kernel_matches_xla(ctx):
    """Whole-engine trajectory at lc=3: pallas2 kernel == XLA path."""
    cfg_x = AnnealConfig(chains=C, max_candidates=8, max_walk=48,
                         top_k=12, kernel="xla", lc=3)
    cfg_p = AnnealConfig(chains=C, max_candidates=8, max_walk=48,
                         top_k=12, kernel="pallas2", chain_block=C, lc=3)
    sx = engine.run_iters(engine.init_state(ctx, cfg_x), ctx, cfg_x, 10)
    sp = engine.run_iters(engine.init_state(ctx, cfg_p), ctx, cfg_p, 10)
    assert int(sx.best_hi) == int(sp.best_hi)
    assert int(sx.best_lo) == int(sp.best_lo)
    np.testing.assert_array_equal(np.asarray(sx.best_slab),
                                  np.asarray(sp.best_slab))
