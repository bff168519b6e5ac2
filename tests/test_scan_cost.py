"""JAX scan coster must agree bit-for-bit with the Python oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from megalania_tpu.models import packets as P
from megalania_tpu.ops import scan_cost, tables as T
from megalania_tpu.runtime import pyemit
from megalania_tpu.utils import fixedpoint as fp

from util import SAMPLES, random_parse


def run_scan(data: bytes, slab: np.ndarray):
    d = jnp.asarray(np.frombuffer(data, np.uint8).astype(np.int32))
    hi, lo, probs, live = scan_cost.parse_cost_jit(jnp.asarray(slab), d)
    return fp.to_int(hi, lo), np.asarray(probs), np.asarray(live)


@pytest.mark.parametrize("name", list(SAMPLES))
def test_cost_matches_oracle(name, rng):
    data = SAMPLES[name]
    for _ in range(2):
        slab = random_parse(data, rng)
        got, probs, live = run_scan(data, slab)
        want = pyemit.parse_cost(data, slab)
        assert got == want, (name, got, want)


def test_probs_and_live_match_oracle(rng):
    data = SAMPLES["text"]
    slab = random_parse(data, rng)
    got, probs, live = run_scan(data, slab)

    sink = pyemit.CostSink()
    enc = pyemit.Encoder(data, sink)
    live_want = np.zeros(len(data), bool)
    for pos, t, d, l in pyemit.walk_slab(slab):
        live_want[pos] = True
        enc.encode_packet(t, d, l)
    assert got == sink.perplexity
    np.testing.assert_array_equal(probs[: T.NUM_PROBS], enc.probs[: T.NUM_PROBS])
    np.testing.assert_array_equal(live.astype(bool), live_want)


def test_literal_slab_cost():
    data = SAMPLES["binary"]
    slab = P.literal_slab(len(data))
    got, _, live = run_scan(data, slab)
    assert got == pyemit.parse_cost(data, slab)
    assert live.all()
