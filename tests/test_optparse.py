"""Optimal-parse initializer (match/optparse.py).

The DP seed must (a) be a valid parse that decodes bit-exactly, (b) be
no worse than the greedy seed under the exact cost model, and (c) plug
into the annealer as init="optimal"/"mixed_opt".
"""
import lzma

import numpy as np
import pytest

from megalania_tpu import compressor
from megalania_tpu.anneal.config import AnnealConfig
from megalania_tpu.match import candidates as C_, optparse
from megalania_tpu.match.suffix import build_lce
from megalania_tpu.runtime import pyemit

DATA = (open("SURVEY.md", "rb").read()[:3000]
        + b"repeat the repeat the repeat the repeat" * 8)


@pytest.fixture(scope="module")
def tab():
    arr = np.frombuffer(DATA, np.uint8)
    return C_.build_candidates(arr, 16, 96, build_lce(arr))


def test_optimal_beats_greedy(tab):
    arr = np.frombuffer(DATA, np.uint8)
    g = C_.greedy_slab(arr, tab)
    o = optparse.build_optimal_slab(arr, tab)
    cg = pyemit.parse_cost(DATA, g)
    co = pyemit.parse_cost(DATA, o)
    assert co < cg                      # strictly better on real text
    blob = pyemit.emit(DATA, o)
    assert lzma.decompress(blob, format=lzma.FORMAT_ALONE) == DATA


def test_optimal_handles_tiny_inputs(tab):
    for raw in (b"", b"a", b"ab", b"aaaaaaa"):
        arr = np.frombuffer(raw, np.uint8)
        t = C_.build_candidates(arr, 8, 16, build_lce(arr))
        o = optparse.build_optimal_slab(arr, t)
        assert len(o) == len(raw)
        if raw:
            blob = pyemit.emit(raw, o)
            assert lzma.decompress(blob, format=lzma.FORMAT_ALONE) == raw


def test_optimal_lc3_prices(tab):
    """lc>0 pricing path: valid parse, decodes under the lc=3 model."""
    arr = np.frombuffer(DATA, np.uint8)
    o = optparse.build_optimal_slab(arr, tab, lc=3)
    blob = pyemit.emit(DATA, o, lc=3)
    assert lzma.decompress(blob, format=lzma.FORMAT_ALONE) == DATA


def test_engine_init_optimal():
    cfg = AnnealConfig(chains=8, max_candidates=8, max_walk=48, top_k=12,
                       init="optimal")
    blob = compressor.compress(DATA, cfg, total_moves=8 * 40)
    assert compressor.decompress(blob) == DATA
    cfg2 = AnnealConfig(chains=8, max_candidates=8, max_walk=48, top_k=12,
                        init="mixed_opt")
    blob2 = compressor.compress(DATA, cfg2, total_moves=8 * 40)
    assert compressor.decompress(blob2) == DATA


# --- native engine (runtime/native/optparse.cpp) ----------------------

def _native():
    from megalania_tpu.match import optparse_native as on
    if not on.available():
        pytest.skip("native optparse library not built")
    return on


def test_native_cost_train_parity(tab):
    """meg_cost_train == the pyemit oracle: perplexity AND every trained
    probability, on real parses at lc=0 and lc=3."""
    on = _native()
    arr = np.frombuffer(DATA, np.uint8)
    for lc in (0, 3):
        for slab in (C_.greedy_slab(arr, tab),
                     optparse.build_optimal_slab(arr, tab, lc=lc)):
            perp, probs = on.cost_train(arr, slab, lc=lc)
            enc = pyemit.Encoder(DATA, pyemit.CostSink(), lc=lc)
            for _, t, d, ln in pyemit.walk_slab(slab):
                enc.encode_packet(t, d, ln)
            assert perp == enc.sink.perplexity
            assert np.array_equal(probs, enc.probs)


def test_native_cost_train_snapshots(tab):
    """Window snapshots = the model state entering each boundary."""
    on = _native()
    arr = np.frombuffer(DATA, np.uint8)
    slab = C_.greedy_slab(arr, tab)
    win = 1024
    nwin = -(-len(arr) // win)
    _, _, snaps = on.cost_train(arr, slab, lc=0, nwin=nwin, win_size=win)
    from megalania_tpu.ops import tables as T
    assert np.array_equal(snaps[0], T.init_probs_np(lc=0))
    # snapshot 1: encode packets with pos < win through the oracle
    enc = pyemit.Encoder(DATA, pyemit.CostSink(), lc=0)
    for pos, t, d, ln in pyemit.walk_slab(slab):
        if pos >= win:
            break
        enc.encode_packet(t, d, ln)
    assert np.array_equal(snaps[1], enc.probs)


def test_native_viterbi_beats_numpy_dp(tab):
    """The rep-aware exact-state Viterbi must beat (or tie) both the
    greedy parse and the 2-bucket numpy DP under the exact model."""
    on = _native()
    arr = np.frombuffer(DATA, np.uint8)
    from megalania_tpu.match.suffix import build_lce
    idx = build_lce(arr)
    nat = optparse.build_optimal_slab_native(arr, tab, lc=0, index=idx)
    cost_nat, _ = on.cost_train(arr, nat, lc=0)
    g = C_.greedy_slab(arr, tab)
    cost_g, _ = on.cost_train(arr, g, lc=0)
    assert cost_nat < cost_g
    blob = pyemit.emit(DATA, nat)
    assert lzma.decompress(blob, format=lzma.FORMAT_ALONE) == DATA


def test_native_viterbi_lc3_roundtrip(tab):
    on = _native()
    arr = np.frombuffer(DATA, np.uint8)
    from megalania_tpu.match.suffix import build_lce
    idx = build_lce(arr)
    s = optparse.build_optimal_slab_native(arr, tab, lc=3, index=idx,
                                           win_size=512)
    blob = pyemit.emit(DATA, s, lc=3)
    assert lzma.decompress(blob, format=lzma.FORMAT_ALONE) == DATA


def test_native_empty_and_tiny():
    on = _native()
    for raw in (b"", b"x", b"aaaaaaaaaaaa"):
        arr = np.frombuffer(raw, np.uint8)
        t = C_.build_candidates(arr, 8, 16, build_lce(arr))
        s = optparse.build_optimal_slab_native(arr, t, lc=0,
                                               index=build_lce(arr))
        assert len(s) == len(raw)
        if raw:
            blob = pyemit.emit(raw, s)
            assert lzma.decompress(blob, format=lzma.FORMAT_ALONE) == raw
