"""A/B reference-semantics variants at matched move budgets (VERDICT r1
item 9): site_mode byte-uniform vs packet-uniform (the reference's rule,
packet_slab_neighbour.c:162-163), and any future repair-fallback
variants.  Prints one JSON line per (corpus, variant) and a winner
summary; budget defaults to a fraction of the reference schedule so the
sweep also runs on CPU.

Usage: python tools/ab_semantics.py [--n 1024] [--budget-scale 0.125]
       [--chains 128] [--platform cpu|tpu]
"""
import sys; sys.path.insert(0, "/root/repo")
import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--budget-scale", type=float, default=0.125)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from megalania_tpu.anneal import engine
    from megalania_tpu.anneal.config import AnnealConfig

    corpora = [
        ("survey.md", open("/root/repo/SURVEY.md", "rb").read()),
        ("pallas.md", open("/opt/skills/guides/pallas_guide.md",
                           "rb").read()),
        ("engine.py", open("/root/repo/megalania_tpu/anneal/engine.py",
                           "rb").read()),
    ]
    variants = [
        {"site_mode": "byte"},
        {"site_mode": "packet"},
        {"lrep_fallback": "match"},
        {"site_mode": "packet", "lrep_fallback": "match"},
    ]

    wins = {}
    for name, raw in corpora:
        data = raw[:args.n]
        n = len(data)
        budget = max(1, int(3 * 200 * n * args.budget_scale))
        iters = max(1, budget // args.chains)
        sizes = {}
        for var in variants:
            cb = args.chains if args.chains % 128 == 0 else 128
            cfg = AnnealConfig(chains=args.chains, chain_block=cb, **var)
            ctx = engine.make_context(data, cfg)
            t0 = time.time()
            st = engine.run_iters(engine.init_state(ctx, cfg), ctx, cfg,
                                  iters)
            jax.block_until_ready(st)
            key = json.dumps(var, sort_keys=True)
            sizes[key] = engine.best_cost_bytes(st)
            print(json.dumps({
                "corpus": name, "n": n, "moves": iters * args.chains,
                **var, "best_bytes": round(sizes[key], 2),
                "seconds": round(time.time() - t0, 1)}), flush=True)
        best = min(sizes, key=sizes.get)
        wins[best] = wins.get(best, 0) + 1
        print(f"# {name}: winner {best}", flush=True)
    print("WINS:", json.dumps(wins), flush=True)


if __name__ == "__main__":
    main()
