"""End-to-end 64 KiB block on the real chip: anneal, emit, xz-verify.

VERDICT r1 item 3: prove the position-tiled v2 kernel holds the
config.block_size = 64 KiB design point on hardware — compile, run a
budget of real moves, emit the winning parse, round-trip through the
real xz binary, and record moves/s + sizes.

The full reference budget at n=64Ki (600n = 39M moves) is hours; this
runs a configurable budget (default 128 iterations x chains moves) to
prove the path and measure steady-state throughput at n=65536.

Usage: python tools/run_64k_block.py [moves] [chains]
"""
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
import json
import subprocess
import tempfile
import time
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from megalania_tpu import compressor
from megalania_tpu.anneal.config import AnnealConfig

N = int(_os.environ.get("RUN64K_N", 1 << 16))
CHAINS = int(sys.argv[2]) if len(sys.argv) > 2 else 512
MOVES = int(sys.argv[1]) if len(sys.argv) > 1 else 128 * CHAINS
LC = int(sys.argv[3]) if len(sys.argv) > 3 else 0
INIT = sys.argv[4] if len(sys.argv) > 4 else "mixed"
ACCEPT = sys.argv[5] if len(sys.argv) > 5 else "cooled"


def main():
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    raw = b""
    for p in (_os.path.join(repo, "SURVEY.md"),
              "/opt/skills/guides/pallas_guide.md",
              _os.path.join(repo, "PERF.md"),
              _os.path.join(repo, "README.md")):
        if _os.path.exists(p):
            raw += open(p, "rb").read()
    data = (raw * (N // len(raw) + 1))[:N]

    cb = (max(d for d in (512, 384, 256, 128) if CHAINS % d == 0)
          if CHAINS % 128 == 0 else 128)
    if LC:
        cb = 128      # lc>0 widens the literal class; VMEM caps the lanes
    cfg = AnnealConfig(chains=CHAINS, chain_block=cb, block_size=N, lc=LC,
                       init=INIT, accept=ACCEPT)
    # checkpoint + resume: a long chip run survives TPU-worker crashes
    # (observed: a 36-min run lost at the final segment); rerunning the
    # same command continues from the last saved segment exactly.
    ck = _os.environ.get("RUN64K_CKPT")
    t0 = time.time()
    res = compressor.compress_block(
        data, cfg, total_moves=MOVES,
        checkpoint_path=ck, checkpoint_every=4, resume=bool(ck))
    dt = time.time() - t0

    with tempfile.NamedTemporaryFile(suffix=".lzma", delete=False) as f:
        f.write(res.stream)
        path = f.name
    dec = subprocess.run(["xz", "--format=lzma", "-dc", path],
                         capture_output=True)
    os.unlink(path)
    ok = dec.stdout == data

    xz = subprocess.run(["xz", "--format=lzma", "-9e", "-c"], input=data,
                        capture_output=True).stdout
    out = {
        "n": N, "chains": CHAINS, "lc": LC, "init": INIT,
        "accept": ACCEPT,
        "moves": res.moves,
        "seconds": round(dt, 1),
        "anneal_seconds": round(res.seconds, 1),
        "moves_per_s": round(res.moves / max(res.seconds, 1e-9), 1),
        "bytes": len(res.stream), "predicted": round(res.predicted_bytes, 1),
        "xz9e_bytes": len(xz),
        "xz_roundtrip_ok": ok,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    assert ok, "xz round trip FAILED"


if __name__ == "__main__":
    main()
