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
