"""Match finder: SA/LCE correctness and the reference's golden specs."""
import numpy as np
import jax.numpy as jnp
import pytest

from megalania_tpu.match import suffix, candidates

from util import SAMPLES, find_matches


def brute_lce(data, a, b):
    n = len(data)
    l = 0
    while a + l < n and b + l < n and data[a + l] == data[b + l]:
        l += 1
    return l


@pytest.mark.parametrize("name", list(SAMPLES))
def test_lce_vs_brute(name, rng):
    data = SAMPLES[name]
    idx = suffix.build_lce(data)
    n = len(data)
    a = rng.integers(0, n, 200)
    b = rng.integers(0, n, 200)
    mask = a != b
    got = suffix.lce_np(idx, a[mask], b[mask])
    want = np.array([brute_lce(data, x, y) for x, y in zip(a[mask], b[mask])])
    np.testing.assert_array_equal(got, want)


def test_lce_jnp_matches_np(rng):
    data = SAMPLES["text"]
    idx = suffix.build_lce(data)
    n = len(data)
    a = rng.integers(0, n, 100)
    b = rng.integers(0, n, 100)
    got = np.asarray(
        suffix.lce_jnp(
            jnp.asarray(idx.rank), jnp.asarray(idx.sparse), n,
            jnp.asarray(a.astype(np.int32)), jnp.asarray(b.astype(np.int32)),
        )
    )
    want = np.array(
        [brute_lce(data, x, y) if x != y else n - x for x, y in zip(a, b)]
    )
    np.testing.assert_array_equal(got, want)


def test_hello_hello_golden():
    """Reference spec: per-position (occurrence, length) pair counts on
    'hello hello' are {0,0,0,0,0,0,4,3,2,1,0}
    (/root/reference/tests/substring_enumerator_test.c:37)."""
    data = b"hello hello"
    expected = [0, 0, 0, 0, 0, 0, 4, 3, 2, 1, 0]
    for pos in range(len(data)):
        occs = candidates.enumerate_occurrences(data, pos)
        # each occurrence with extension e contributes lengths 2..e
        npairs = sum(e - 1 for _, e in occs)
        assert npairs == expected[pos], (pos, occs)


def test_enumeration_matches_bruteforce(rng):
    data = SAMPLES["text"]
    idx = suffix.build_lce(data)
    for pos in rng.integers(1, len(data) - 1, 30):
        got = sorted(candidates.enumerate_occurrences(data, int(pos), idx))
        want = sorted(find_matches(data, int(pos)))
        assert got == want, pos


@pytest.mark.parametrize("name", list(SAMPLES))
def test_candidate_table_is_pareto_frontier(name):
    data = SAMPLES[name]
    tab = candidates.build_candidates(data, max_candidates=16, max_walk=4096)
    for pos in range(len(data)):
        # Pareto frontier nearest-first: keep strictly-growing extensions
        # (find_matches returns increasing-offset order, i.e. farthest
        # first, so sort by distance ascending)
        frontier, best = [], 0
        for d, e in sorted(find_matches(data, pos)):
            if e > best:
                frontier.append((d, e))
                best = e
        frontier = frontier[:16]
        got = [
            (int(tab.dist[pos, j]), int(tab.length[pos, j]))
            for j in range(int(tab.count[pos]))
        ]
        assert got == frontier, (name, pos, got, frontier)


def test_candidate_entries_are_valid_matches():
    data = SAMPLES["runs"]
    tab = candidates.build_candidates(data)
    for pos in range(len(data)):
        for j in range(int(tab.count[pos])):
            d, l = int(tab.dist[pos, j]), int(tab.length[pos, j])
            src = pos - d - 1
            assert src >= 0 and l >= 2
            assert data[src:src + l] == data[pos:pos + l]


def test_native_lcp_parity():
    """meg_lcp (C++) must equal the numpy Kasai on real+random bytes
    (build_lce switches to it past 64 KiB)."""
    import pytest
    from megalania_tpu.match import suffix
    try:
        from megalania_tpu.match import optparse_native as on
        if not on.available():
            pytest.skip("native library not built")
    except Exception:
        pytest.skip("native library not built")
    rng = np.random.default_rng(11)
    blob = (open("SURVEY.md", "rb").read()[:3000]
            + bytes(rng.integers(0, 8, 3000, dtype=np.uint8)))
    arr = np.frombuffer(blob, np.uint8)
    sa = suffix.suffix_array(arr)
    assert np.array_equal(on.lcp(arr, sa), suffix.lcp_array(arr, sa))
