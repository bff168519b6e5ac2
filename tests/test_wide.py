"""Wide-distance blocks (> 1 MiB): the host-side DP-only pipeline.

The packed slab's 20-bit dist field caps annealable blocks at 1 MiB
(models/packets.py); larger blocks run the native optimum parser with a
full-width distance array and the Python emitter.  The reference's
enumerator has no window at all (substring_enumerator.c:97) — this is
the equivalent capability at container scale.
"""
import lzma

import numpy as np
import pytest

from megalania_tpu import compressor
from megalania_tpu.anneal.config import AnnealConfig


def _native_or_skip():
    from megalania_tpu.match import optparse_native as on
    if not on.available():
        pytest.skip("native optparse library not built")


def test_wide_block_long_range_match():
    """A repeat whose distance exceeds 1 MiB must be found, emitted,
    and decoded by the standard lzma decoder."""
    _native_or_skip()
    rng = np.random.default_rng(7)
    head = bytes(rng.integers(0, 256, (1 << 20) + 10_000, dtype=np.uint8))
    data = head + head[:50_000]        # matches at dist > 2**20
    cfg = AnnealConfig(block_size=2 << 20, init="optimal",
                       opt_candidates=8, opt_walk=16, opt_passes=2)
    blob = compressor.compress(data, cfg, total_moves=0)
    assert compressor.decompress(blob) == data
    assert lzma.decompress(blob, format=lzma.FORMAT_ALONE) == data
    # the 50 KB repeat must have collapsed into long-range matches
    # (incompressible literals cost ~1.5% over raw, so compare against
    # the whole input: only the repeat can buy the 30 KB margin)
    assert len(blob) < len(data) - 30_000


def test_wide_block_requires_dp_only():
    """Annealing a > 1 MiB block is a clear error, not silent truncation."""
    _native_or_skip()
    data = b"x" * ((1 << 20) + 1)
    cfg = AnnealConfig(block_size=2 << 20, init="optimal")
    with pytest.raises(ValueError, match="wide DP-only"):
        compressor.compress_block(data, cfg, total_moves=1000)
