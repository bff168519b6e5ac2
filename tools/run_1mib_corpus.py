"""End-to-end >=1 MiB corpus through compressor.compress on the chip.

VERDICT r2 item 3 (second half): a multi-block real-file run — block
splitting, per-block annealing (mesh path when available), ordered
container assembly, full decode verification, ratio vs xz -9e.

Usage: python tools/run_1mib_corpus.py [moves_per_block] [chains]
"""
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
import json
import subprocess
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from megalania_tpu import compressor
from megalania_tpu.anneal.config import AnnealConfig

CHAINS = int(sys.argv[2]) if len(sys.argv) > 2 else 512
MOVES_PER_BLOCK = int(sys.argv[1]) if len(sys.argv) > 1 else 256 * CHAINS
TARGET = 1 << 20


def build_corpus() -> bytes:
    """>=1 MiB of real local bytes: binary + prose + source."""
    parts = []
    for p in ("/usr/lib/x86_64-linux-gnu/libc.so.6",
              "/opt/skills/guides/pallas_guide.md"):
        if _os.path.exists(p):
            parts.append(open(p, "rb").read())
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    for root, _, files in _os.walk(_os.path.join(repo, "megalania_tpu")):
        for f in sorted(files):
            if f.endswith(".py"):
                parts.append(open(_os.path.join(root, f), "rb").read())
    raw = b"".join(parts)
    if len(raw) < TARGET:
        raw = (raw * (TARGET // len(raw) + 1))
    return raw[:TARGET]


def main():
    data = build_corpus()
    cb = (max(d for d in (512, 384, 256, 128) if CHAINS % d == 0)
          if CHAINS % 128 == 0 else 128)
    cfg = AnnealConfig(chains=CHAINS, chain_block=cb)
    n_blocks = -(-len(data) // cfg.block_size)
    total = MOVES_PER_BLOCK * n_blocks
    t0 = time.time()
    blob = compressor.compress(data, cfg, total_moves=total,
                               progress=None)
    dt = time.time() - t0
    ok = compressor.decompress(blob) == data

    xz = subprocess.run(["xz", "--format=lzma", "-9e", "-c"], input=data,
                        capture_output=True).stdout
    gz = subprocess.run(["gzip", "-9", "-c"], input=data,
                        capture_output=True).stdout
    out = {
        "n": len(data), "blocks": n_blocks, "chains": CHAINS,
        "moves": total, "seconds": round(dt, 1),
        "moves_per_s": round(total / dt, 1),
        "bytes": len(blob),
        "xz9e_bytes": len(xz), "gzip9_bytes": len(gz),
        "decode_ok": ok,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    assert ok, "container decode FAILED"


if __name__ == "__main__":
    main()
