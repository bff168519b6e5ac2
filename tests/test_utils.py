"""Checkpoint round trip + metrics logger."""
import io

import numpy as np

from megalania_tpu.anneal import engine
from megalania_tpu.anneal.config import AnnealConfig
from megalania_tpu.utils import checkpoint, fixedpoint as fp, metrics

DATA = b"checkpointing the annealer state roundtrips exactly " * 3
CFG = AnnealConfig(chains=4, max_candidates=8, max_walk=32, top_k=8)


def test_checkpoint_roundtrip(tmp_path):
    ctx = engine.make_context(DATA, CFG)
    state = engine.init_state(ctx, CFG)
    state = engine.run_iters(state, ctx, CFG, 5)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, state)
    loaded = checkpoint.load(path)

    # resumed run must continue bit-identically
    a = engine.run_iters(state, ctx, CFG, 5)
    b = engine.run_iters(loaded, ctx, CFG, 5)
    assert fp.to_int(a.best_hi, a.best_lo) == fp.to_int(b.best_hi, b.best_lo)
    np.testing.assert_array_equal(np.asarray(a.chains.slab),
                                  np.asarray(b.chains.slab))


def test_metrics_logger():
    buf = io.StringIO()
    m = metrics.MetricsLogger(stream=buf)
    m.log(moves=0, best=100.0)
    m.history[-1]["t"] = 0.0
    m.log(moves=1000, best=90.0)
    m.history[-1]["t"] = 2.0
    assert m.moves_per_sec() == 500.0
    assert "best=90.0" in buf.getvalue()
