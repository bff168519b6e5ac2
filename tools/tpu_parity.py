"""Real-TPU parity: pallas kernel vs XLA scan on the chip."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from megalania_tpu.anneal import engine
from megalania_tpu.anneal.config import AnnealConfig
from megalania_tpu.models import packets as P
from megalania_tpu.ops import pallas_repair, repair_scan, tables as T

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DATA = open("/root/repo/SURVEY.md", "rb").read()[:2048]
C = 16
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

corr = jnp.asarray(pallas_repair.log2_correction(interpret=False))
got = jax.block_until_ready(pallas_repair.repair_cost_pallas(
    slabs_j, q, u, ctx.data, ctx.data_packed, ctx.cand_dist, ctx.cand_len,
    corr, cb=C))
want = jax.block_until_ready(repair_scan.repair_cost_batched(
    slabs_j, q, u, ctx.data, ctx.cand_dist, ctx.cand_len, ctx.log2))
names = ("slab", "hi", "lo", "probs", "rec_ctx", "rec_dists", "rec_live")
ok = True
for nm, g, w in zip(names, got, want):
    g, w = np.asarray(g), np.asarray(w)
    if nm == "probs":
        g, w = g[:, :T.NUM_PROBS], w[:, :T.NUM_PROBS]
    if not np.array_equal(g, w):
        ok = False
        print(f"{nm}: MISMATCH ({np.sum(g != w)} cells)")
        if g.ndim == 1:
            print(" got", g, "\n want", w)
print("TPU PARITY:", "OK" if ok else "FAIL")
