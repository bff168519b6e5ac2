"""enwik8-scale evidence (block_size via argv[3]; > 1 MiB = wide pipeline): a deterministic >=4 MiB corpus through the
full product pipeline (block split, per-block optimum parse / anneal,
.mlz container, full decode verification), vs xz -9e and gzip -9.

No public corpora exist in this container (zero egress), so the corpus
is built from fixed in-container files (binary + prose + source), with
sha256 recorded in the output JSON for reproducibility.

Usage: python tools/run_4mib_corpus.py [moves_per_block] [lc]
  moves_per_block 0 (default) = DP-only mode (optimum-parse seed,
  host-side, no device).
"""
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
import gzip
import hashlib
import json
import subprocess
import time

MOVES_PER_BLOCK = int(sys.argv[1]) if len(sys.argv) > 1 else 0
LC = int(sys.argv[2]) if len(sys.argv) > 2 else 3
BLOCK = int(sys.argv[3]) if len(sys.argv) > 3 else (1 << 20)
TARGET = 4 << 20

_FILES = (
    "/usr/lib/x86_64-linux-gnu/libc.so.6",
    "/opt/skills/guides/pallas_guide.md",
    "/usr/lib/python3.11/_pydecimal.py",
    "/usr/lib/python3.11/typing.py",
    "/usr/lib/python3.11/tarfile.py",
    "/usr/lib/python3.11/inspect.py",
    "/usr/lib/python3.11/doctest.py",
    "/usr/lib/python3.11/pickletools.py",
    "/usr/lib/x86_64-linux-gnu/libstdc++.so.6",
)


def build_corpus() -> bytes:
    parts = []
    for p in _FILES:
        if _os.path.exists(p):
            parts.append(open(p, "rb").read())
    raw = b"".join(parts)
    if len(raw) < TARGET:
        raw = raw * (TARGET // len(raw) + 1)
    return raw[:TARGET]


def main():
    if MOVES_PER_BLOCK == 0:
        import jax
        jax.config.update("jax_platforms", "cpu")   # host-only pipeline
    from megalania_tpu import compressor
    from megalania_tpu.anneal.config import AnnealConfig

    data = build_corpus()
    cfg = AnnealConfig(chains=128, block_size=BLOCK, lc=LC,
                       init="optimal", accept="greedy")
    n_blocks = -(-len(data) // cfg.block_size)
    t0 = time.time()
    blob = compressor.compress(data, cfg,
                               total_moves=MOVES_PER_BLOCK * n_blocks)
    dt = time.time() - t0
    ok = compressor.decompress(blob) == data

    xz = subprocess.run(["xz", "--format=lzma", "-9e", "-c"], input=data,
                        capture_output=True).stdout
    gz = gzip.compress(data, 9)
    out = {
        "corpus_bytes": len(data),
        "corpus_sha256": hashlib.sha256(data).hexdigest(),
        "blocks": n_blocks, "block_size": cfg.block_size, "lc": LC,
        "moves_per_block": MOVES_PER_BLOCK,
        "pipeline": "dp_only" if MOVES_PER_BLOCK == 0 else "anneal",
        "bytes": len(blob),
        "xz9e_bytes": len(xz),
        "gzip9_bytes": len(gz),
        "vs_xz": round(len(blob) / len(xz) - 1, 4),
        "vs_gzip": round(len(blob) / len(gz) - 1, 4),
        "seconds": round(dt, 1),
        "decode_ok": ok,
    }
    print(json.dumps(out))
    assert ok, "container decode FAILED"


if __name__ == "__main__":
    main()
