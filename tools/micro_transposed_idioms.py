"""Probe: Mosaic idioms needed by the transposed-layout repair kernel.

One kernel exercising, with probs laid out [P_sub, C_lane]:
  * sublane-window one-hot gather/scatter (static sublane slices),
  * scalar dynamic slice on the sublane dim (pl.ds with traced scalar),
  * pl.when section guard on a reduced scalar condition,
  * [1, C] per-chain scalar rows + broadcasted_iota on dim 0,
  * fori_loop over positions reading a [1, C] row of a [n, C] ref.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

C = 128
P = 256
N = 64


def kernel(tab_ref, idx_ref, node_ref, out_ref, acc_ref):
    def body(i, acc):
        idx = idx_ref[pl.ds(i, 1), :]                     # [1, C] per-chain
        # --- window one-hot gather from sublanes [64, C] window ---
        win = tab_ref[64:128, :]
        sub = jax.lax.broadcasted_iota(jnp.int32, (64, C), 0) + 64
        m = sub == idx                                     # bcast [1,C]->[64,C]
        p = jnp.sum(jnp.where(m, win, 0), axis=0, keepdims=True)
        # --- scatter back (RMW on the same window) ---
        tab_ref[64:128, :] = jnp.where(m, win + 1, win)
        # --- scalar dynamic slice on sublane dim ---
        node = node_ref[i]                                 # SMEM scalar
        row3 = tab_ref[pl.ds(node, 2), :]                  # [2, C]
        p2 = row3[0:1, :] + row3[1:2, :]
        # --- pl.when guard on a reduced condition ---
        @pl.when(jnp.sum(idx) % 2 == 0)
        def _():
            acc_ref[0:1, :] += p2
        return acc + p

    acc = jax.lax.fori_loop(0, N, body, jnp.zeros((1, C), jnp.int32))
    out_ref[:] = acc


tab = jnp.arange(P * C, dtype=jnp.int32).reshape(P, C)
idx = (jnp.arange(N * C, dtype=jnp.int32).reshape(N, C) * 7) % 64 + 64
node = (jnp.arange(N, dtype=jnp.int32) * 3) % (P - 2)

t = time.time()
out, acc = pl.pallas_call(
    kernel,
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ],
    out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
               pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_shape=[jax.ShapeDtypeStruct((1, C), jnp.int32),
               jax.ShapeDtypeStruct((1, C), jnp.int32)],
    input_output_aliases={0: None} if False else {},
)(tab, idx, node)
out = np.asarray(out)
print("compile+run %.1fs" % (time.time() - t), flush=True)

# golden check on host
tabh = np.arange(P * C, dtype=np.int64).reshape(P, C).copy()
idxh = np.asarray(idx)
nodeh = np.asarray(node)
acch = np.zeros(C, np.int64)
outh = np.zeros(C, np.int64)
for i in range(N):
    m = (np.arange(64)[:, None] + 64) == idxh[i][None, :]
    win = tabh[64:128, :]
    outh += np.sum(np.where(m, win, 0), axis=0)
    tabh[64:128, :] = np.where(m, win + 1, win)
    p2 = tabh[nodeh[i]] + tabh[nodeh[i] + 1]
    if idxh[i].sum() % 2 == 0:
        acch += p2
print("gather match:", np.array_equal(outh, np.asarray(out).ravel()),
      "when match:", np.array_equal(acch, np.asarray(acc).ravel()), flush=True)
