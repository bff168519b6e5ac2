"""Real-TPU parity + timing: v2 class-decomposed kernel vs XLA scan."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from megalania_tpu.anneal import engine
from megalania_tpu.anneal.config import AnnealConfig
from megalania_tpu.models import packets as P
from megalania_tpu.ops import pallas_repair2, repair_scan, tables as T

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
C = int(sys.argv[2]) if len(sys.argv) > 2 else 128
CB = int(sys.argv[3]) if len(sys.argv) > 3 else 128
DATA = open("/root/repo/SURVEY.md", "rb").read()[:N]
cfg = AnnealConfig(chains=C, max_candidates=16, max_walk=96, kernel="xla")
ctx = engine.make_context(DATA, cfg)
n = len(DATA)

rng = np.random.default_rng(7)
base = P.literal_slab(n)
slabs = np.broadcast_to(base, (C, n)).copy()
cd, cl = np.asarray(ctx.cand_dist), np.asarray(ctx.cand_len)
for c in range(C):
    for _ in range(24):
        i = int(rng.integers(2, n - 4))
        m = int(rng.integers(0, cd.shape[1]))
        if cl[i, m] >= 2:
            slabs[c, i] = P.pack_np(P.MATCH, cd[i, m], min(int(cl[i, m]), n - i))
        slabs[c, int(rng.integers(1, n))] = P.pack_np(P.LREP, int(rng.integers(0, 4)), 2)
        slabs[c, int(rng.integers(1, n))] = P.pack_np(P.SREP, 0, 1)
q = jnp.asarray(rng.integers(0, n, C), jnp.int32)
u = jnp.asarray(rng.integers(0, n, C), jnp.int32)
slabs_j = jnp.asarray(slabs)

corr = jnp.asarray(pallas_repair2.log2_correction(interpret=False))
t0 = time.time()
got = jax.block_until_ready(pallas_repair2.repair_cost_pallas2(
    slabs_j, q, u, ctx.data, ctx.data_packed, ctx.cand_dist, ctx.cand_len,
    corr, cb=CB))
print("v2 compile+run1: %.1fs" % (time.time() - t0))

# timing: 8 chained passes (feed slab output back in)
REPS = 8
t0 = time.time()
s = slabs_j
for _ in range(REPS):
    out = pallas_repair2.repair_cost_pallas2(
        s, q, u, ctx.data, ctx.data_packed, ctx.cand_dist, ctx.cand_len,
        corr, cb=CB)
    s = out[0]
jax.block_until_ready(s)
dt = time.time() - t0
print("v2: n=%d C=%d cb=%d  %.4fs/pass  %.0f moves/s" % (
    n, C, CB, dt / REPS, C * REPS / dt))

want = jax.block_until_ready(repair_scan.repair_cost_batched(
    slabs_j, q, u, ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2))
from megalania_tpu.ops import problayout as PL
got = list(got)
got[3] = PL.flat_from_packed(got[3])   # v2 returns the packed layout
names = ("slab", "hi", "lo", "probs", "rec_ctx", "rec_dists",
         "rec_live", "live_count")
ok = True
for nm, g, w in zip(names, got, want):
    g, w = np.asarray(g), np.asarray(w)
    if nm == "probs":
        g, w = g[:, :T.NUM_PROBS], w[:, :T.NUM_PROBS]
    if not np.array_equal(g, w):
        ok = False
        print(f"{nm}: MISMATCH ({np.sum(g != w)} cells)")
print("TPU PARITY v2:", "OK" if ok else "FAIL")
