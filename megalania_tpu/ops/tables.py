"""Probability-model layout and fixed-point log2 cost table.

The LZMA adaptive probability model is held as ONE flat int32 vector per
chain so that the annealing scan can gather/scatter probability slots with
a single vectorized op.  Layout mirrors the semantic groups of the LZMA
format (reference: /root/reference/src/lzma_state.h:15-55) but flattened
with static offsets; values are 11-bit probabilities (0..2048).

Cost model: fixed point "bits << 11".  LOG2_LOOKUP[i] = trunc(-log2(i/2048)
* 2048), LOG2_LOOKUP[0] = 0 sentinel (reference: generate_table.py:7-9,
perplexity_encoder.c:6-17).  The table is *computed* here, not copied.
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Fixed-point parameters (LZMA spec constants)
# ---------------------------------------------------------------------------
PROB_BITS = 11                 # probabilities are 11-bit: p(bit==0) = P/2048
PROB_ONE = 1 << PROB_BITS      # 2048
PROB_INIT = PROB_ONE // 2      # 1024
MOVE_BITS = 5                  # adaptation shift

NUM_STATES = 12                # ctx-state machine size
POS_BITS_MAX = 4               # position-context bits reserved in layout

MATCH_LEN_MIN = 2
MATCH_LEN_MAX = 273

# ---------------------------------------------------------------------------
# Flat probability-table layout (sizes per group)
# ---------------------------------------------------------------------------
IS_MATCH = 0                                   # [12 << 4] ctx_state<<4 | posbits
IS_REP = IS_MATCH + (NUM_STATES << POS_BITS_MAX)          # [12]
IS_REP_G0 = IS_REP + NUM_STATES                           # [12]
IS_REP_G1 = IS_REP_G0 + NUM_STATES                        # [12]
IS_REP_G2 = IS_REP_G1 + NUM_STATES                        # [12]
IS_REP0_LONG = IS_REP_G2 + NUM_STATES                     # [12 << 4]

# Length coder: choice1, choice2, low[16][8], mid[16][8], high[256] = 514
LEN_CHOICE1 = 0
LEN_CHOICE2 = 1
LEN_LOW = 2                    # 16 pos-contexts x 8 tree slots
LEN_MID = LEN_LOW + 16 * 8     # 130
LEN_HIGH = LEN_MID + 16 * 8    # 258
LEN_CODER_SIZE = LEN_HIGH + 256  # 514

LEN = IS_REP0_LONG + (NUM_STATES << POS_BITS_MAX)         # match lengths
REP_LEN = LEN + LEN_CODER_SIZE                            # rep lengths

# Distance coder: pos_slot[4][64], align[16], pos_coder[115]
DIST_SLOT = REP_LEN + LEN_CODER_SIZE
ALIGN = DIST_SLOT + 4 * 64
POS_CODER = ALIGN + 16         # 1 + 128 - 14 = 115 slots

LIT = POS_CODER + 115          # literal coder, 0x300 slots (lc=lp=0)

NUM_PROBS = LIT + 0x300        # == 2615, matches the reference model size
PROBS_PAD = 2688               # pad to a multiple of 128 lanes
DEAD_SLOT = PROBS_PAD - 1      # scatter target for masked-out bit ops

assert NUM_PROBS == 2615
assert DEAD_SLOT >= NUM_PROBS

# ---------------------------------------------------------------------------
# log2 cost table
# ---------------------------------------------------------------------------


def make_log2_table() -> np.ndarray:
    """-log2(i/2048)*2048, truncated toward zero; index 0 is a sentinel 0."""
    i = np.arange(1, PROB_ONE, dtype=np.float64)
    vals = np.trunc(-np.log2(i / PROB_ONE) * PROB_ONE)
    out = np.zeros(PROB_ONE, dtype=np.int64)
    out[1:] = vals.astype(np.int64)
    return out


LOG2_TABLE_NP = make_log2_table()          # int64 numpy master copy
LOG2_TABLE_I32 = LOG2_TABLE_NP.astype(np.int32)  # max value 11*2048 fits easily


def init_probs_np(batch_shape: tuple = ()) -> np.ndarray:
    """Fresh probability vector(s): every real slot = PROB_INIT, padding = 0."""
    probs = np.zeros(batch_shape + (PROBS_PAD,), dtype=np.int32)
    probs[..., :NUM_PROBS] = PROB_INIT
    return probs


# ctx-state transition table T[type, state] (semantics of
# /root/reference/src/lzma_state.c:29-57, re-derived from the LZMA spec:
# literal cools the state toward 0, match/rep jump to their post-states).
# Internal packet type codes: LIT=0, MATCH=1, SREP=2, LREP=3.
def make_ctx_transition() -> np.ndarray:
    t = np.zeros((4, NUM_STATES), dtype=np.int32)
    s = np.arange(NUM_STATES)
    t[0] = np.where(s < 4, 0, np.where(s < 10, s - 3, s - 6))   # literal
    t[1] = np.where(s < 7, 7, 10)                               # match
    t[2] = np.where(s < 7, 9, 11)                               # short rep
    t[3] = np.where(s < 7, 8, 11)                               # long rep
    return t


CTX_TRANSITION_NP = make_ctx_transition()
