"""Pallas fused kernel == portable lax.scan pass, bit for bit (CPU
interpret mode; the same comparison runs on real TPU via tools/).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from megalania_tpu.anneal import engine, moves
from megalania_tpu.anneal.config import AnnealConfig
from megalania_tpu.models import packets as P
from megalania_tpu.ops import pallas_repair, repair_scan, tables as T

DATA = (b"abra cadabra abra cadabra! abracadabra? "
        b"the rain in spain falls mainly on the plain. " * 3)[:192]
C = 8


@pytest.fixture(scope="module")
def ctx():
    cfg = AnnealConfig(chains=C, max_candidates=8, max_walk=48)
    return engine.make_context(DATA, cfg)


def _run_both(ctx, slabs, q, u):
    corr = jnp.asarray(pallas_repair.log2_correction(interpret=True))
    got = pallas_repair.repair_cost_pallas(
        slabs, q, u, ctx.data, ctx.data_packed, ctx.cand_dist,
        ctx.cand_len, corr, cb=C, interpret=True,
    )
    want = repair_scan.repair_cost_batched(
        slabs, q, u, ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2,
    )
    return got, want


def _check(got, want):
    names = ("slab", "hi", "lo", "probs", "rec_ctx", "rec_dists", "rec_live")
    for name, g, w in zip(names, got, want):
        g, w = np.asarray(g), np.asarray(w)
        if name == "probs":
            g, w = g[:, :T.NUM_PROBS], w[:, :T.NUM_PROBS]  # pad slot differs
        np.testing.assert_array_equal(g, w, err_msg=name)


def test_parity_all_literals(ctx):
    n = ctx.data.shape[0]
    slabs = jnp.broadcast_to(jnp.asarray(P.literal_slab(n)), (C, n))
    q = jnp.zeros(C, jnp.int32)
    u = jnp.arange(C, dtype=jnp.int32) * (n // C)
    got, want = _run_both(ctx, slabs, q, u)
    _check(got, want)


def test_parity_mutated_slabs(ctx, rng):
    """Random rep/match mutations at random sites, random repair starts."""
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
    q = jnp.asarray(rng.integers(0, n // 2, C), jnp.int32)
    u = jnp.asarray(rng.integers(0, n, C), jnp.int32)
    got, want = _run_both(ctx, jnp.asarray(slabs), q, u)
    _check(got, want)


def test_engine_pallas_matches_xla(ctx):
    """Whole-engine smoke: same trajectory under both kernels."""
    cfg_x = AnnealConfig(chains=C, max_candidates=8, max_walk=48,
                         top_k=12, kernel="xla")
    cfg_p = AnnealConfig(chains=C, max_candidates=8, max_walk=48,
                         top_k=12, kernel="pallas", chain_block=C)
    sx = engine.run_iters(engine.init_state(ctx, cfg_x), ctx, cfg_x, 12)
    sp = engine.run_iters(engine.init_state(ctx, cfg_p), ctx, cfg_p, 12)
    assert int(sx.best_hi) == int(sp.best_hi)
    assert int(sx.best_lo) == int(sp.best_lo)
    np.testing.assert_array_equal(np.asarray(sx.best_slab),
                                  np.asarray(sp.best_slab))
