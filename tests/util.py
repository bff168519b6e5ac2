"""Shared test helpers: brute-force match search and random valid parses."""
from __future__ import annotations

import numpy as np

from megalania_tpu.models import packets as P


def find_matches(data: bytes, pos: int, max_len: int = 273):
    """All (dist, max_extension) for previous occurrences of the bigram at
    pos, brute force.  dist is stored-form (distance-1)."""
    out = []
    n = len(data)
    if pos == 0 or pos + 1 >= n:
        return out
    for off in range(pos):
        if data[off] == data[pos] and data[off + 1] == data[pos + 1]:
            l = 2
            while l < max_len and pos + l < n and data[off + l] == data[pos + l]:
                l += 1
            out.append((pos - off - 1, l))
    return out


def random_parse(data: bytes, rng, p_match: float = 0.6) -> np.ndarray:
    """Random *valid* parse of data, exercising all four packet types."""
    n = len(data)
    slab = P.literal_slab(n)
    dists = [0, 0, 0, 0]
    pos = 0
    while pos < n:
        cands = [("lit",)]
        if pos > 0 and pos - dists[0] - 1 >= 0 and data[pos] == data[pos - dists[0] - 1]:
            cands.append(("srep",))
        for d, maxl in find_matches(data, pos):
            ln = int(rng.integers(2, maxl + 1))
            cands.append(("match", d, ln))
            for i, dv in enumerate(dists):
                if dv == d:
                    cands.append(("lrep", i, ln))
        if len(cands) > 1 and rng.random() < p_match:
            c = cands[int(rng.integers(1, len(cands)))]
        else:
            c = cands[0]
        if c[0] == "lit":
            slab[pos] = P.pack_np(P.LIT, 0, 1)
            pos += 1
        elif c[0] == "srep":
            slab[pos] = P.pack_np(P.SREP, 0, 1)
            pos += 1
        elif c[0] == "match":
            _, d, ln = c
            slab[pos] = P.pack_np(P.MATCH, d, ln)
            dists = [d] + dists[:3]
            pos += ln
        else:
            _, i, ln = c
            slab[pos] = P.pack_np(P.LREP, i, ln)
            dists = [dists[i]] + dists[:i] + dists[i + 1:]
            pos += ln
    return slab


SAMPLES = {
    "abc_rep": b"abcabcabcabcabc",
    "text": (
        b"the quick brown fox jumps over the lazy dog. "
        b"the quick brown fox jumps over the lazy dog again and again. "
        b"pack my box with five dozen liquor jugs. " * 3
    ),
    "runs": b"aaaaaaaabbbbbbbbccccccccaaaaaaaa" * 4,
    "binary": bytes(np.random.default_rng(7).integers(0, 8, 300, dtype=np.uint8)),
}
