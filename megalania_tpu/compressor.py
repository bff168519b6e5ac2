"""Top-level compression API: file bytes -> .lzma / .mlz container."""
from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np

from .anneal import engine
from .anneal.config import AnnealConfig
from .parallel import blocks as blocks_mod
from .runtime import emit as emit_mod
from .utils import fixedpoint as fp


@dataclass
class BlockResult:
    stream: bytes
    raw_len: int
    predicted_bytes: float
    moves: int
    seconds: float


def reference_budget(n: int, cfg: AnnealConfig) -> int:
    """Total moves the reference would spend on an n-byte input
    (3 steps x 200 epochs x n iters, main.c:66-69)."""
    return cfg.num_steps * cfg.num_epochs * max(n, 1)


def compress_block(
    data: bytes,
    cfg: AnnealConfig,
    total_moves: Optional[int] = None,
    segment_iters: int = 256,
    progress: Optional[Callable[[dict], None]] = None,
) -> BlockResult:
    """Anneal one block and emit its .lzma stream."""
    t0 = time.time()
    n = len(data)
    if n == 0:
        return BlockResult(emit_mod.emit(b"", np.zeros(0, np.uint32)), 0,
                           18.0, 0, time.time() - t0)
    if total_moves is None:
        total_moves = reference_budget(n, cfg)
    iters = max(1, total_moves // cfg.chains)

    ctx = engine.make_context(data, cfg)
    state = engine.init_state(ctx, cfg)
    done = 0
    while done < iters:
        seg = min(segment_iters, iters - done)
        state = engine.run_iters(state, ctx, cfg, seg)
        done += seg
        if progress is not None:
            progress({
                "iter": done,
                "iters": iters,
                "moves": int(state.moves_done),
                "best_bytes": engine.best_cost_bytes(state),
                "epochs": int(state.epochs_done),
            })
    slab = np.asarray(state.best_slab)
    stream = emit_mod.emit(data, slab, dict_size=cfg.dict_size)
    return BlockResult(
        stream=stream,
        raw_len=n,
        predicted_bytes=engine.best_cost_bytes(state),
        moves=int(state.moves_done),
        seconds=time.time() - t0,
    )


def compress(
    data: bytes,
    cfg: AnnealConfig = AnnealConfig(),
    total_moves: Optional[int] = None,
    progress: Optional[Callable[[dict], None]] = None,
) -> bytes:
    """Compress to a plain .lzma (single block) or .mlz container."""
    parts = blocks_mod.split_blocks(data, cfg.block_size)
    results: List[BlockResult] = []
    for bi, part in enumerate(parts):
        def block_progress(info, bi=bi):
            if progress is not None:
                progress({"block": bi, "blocks": len(parts), **info})
        moves = None
        if total_moves is not None:
            moves = max(1, total_moves // len(parts))
        results.append(
            compress_block(part, cfg, moves, progress=block_progress)
        )
    if len(results) == 1:
        return results[0].stream
    return blocks_mod.pack_container(
        [r.stream for r in results], [r.raw_len for r in results]
    )


def decompress(blob: bytes) -> bytes:
    return blocks_mod.decompress(blob)
