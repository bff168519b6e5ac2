import numpy as np

from megalania_tpu.ops import tables as T


def test_layout_totals():
    # 1792 = the reference's 2615-prob model minus the pos-context and
    # pos-state copies that pb=0 leaves permanently unused (tables.py)
    assert T.NUM_PROBS == 1792
    assert T.LIT + 0x300 == T.NUM_PROBS
    assert T.DEAD_SLOT >= T.NUM_PROBS
    # group boundaries are disjoint and ordered
    offs = [T.IS_MATCH, T.IS_REP, T.IS_REP_G0, T.IS_REP_G1, T.IS_REP_G2,
            T.IS_REP0_LONG, T.LEN, T.REP_LEN, T.DIST_SLOT, T.ALIGN,
            T.POS_CODER, T.LIT]
    assert offs == sorted(offs)


def test_log2_table_goldens():
    t = T.LOG2_TABLE_NP
    assert t[0] == 0                       # sentinel
    assert t[1] == 11 * 2048               # -log2(1/2048)*2048
    assert t[1024] == 2048                 # -log2(1/2) = 1 bit
    assert t[2047] == 1                    # trunc(-log2(2047/2048)*2048)
    # monotone decreasing over the real range
    assert np.all(np.diff(t[1:]) <= 0)
    # spot-check truncation semantics
    import math
    for i in [3, 7, 100, 999, 1500]:
        assert t[i] == int(-math.log2(i / 2048.0) * 2048)


def test_ctx_transition():
    t = T.CTX_TRANSITION_NP
    # literal cools toward 0
    assert list(t[0]) == [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 4, 5]
    assert list(t[1][:7]) == [7] * 7 and list(t[1][7:]) == [10] * 5
    assert list(t[2][:7]) == [9] * 7 and list(t[2][7:]) == [11] * 5
    assert list(t[3][:7]) == [8] * 7 and list(t[3][7:]) == [11] * 5


def test_init_probs():
    p = T.init_probs_np()
    assert p.shape == (T.PROBS_PAD,)
    assert np.all(p[: T.NUM_PROBS] == 1024)
    assert np.all(p[T.NUM_PROBS:] == 0)
