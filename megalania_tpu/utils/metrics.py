"""Structured per-block metrics (SURVEY.md §5.5).

The reference logs one stderr line per 100 moves (main.c:97-99); here a
MetricsLogger collects structured records host-side and can emit both
human-readable lines and JSONL for dashboards.
"""
from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass, field
from typing import IO, List, Optional


@dataclass
class MetricsLogger:
    stream: Optional[IO] = None          # human-readable lines (e.g. stderr)
    jsonl_path: Optional[str] = None     # structured log
    history: List[dict] = field(default_factory=list)
    t0: float = field(default_factory=time.time)

    def log(self, **record):
        record.setdefault("t", round(time.time() - self.t0, 3))
        self.history.append(record)
        if self.stream is not None:
            parts = [f"{k}={v}" for k, v in record.items()]
            self.stream.write("  ".join(parts) + "\n")
            self.stream.flush()
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(record) + "\n")

    def moves_per_sec(self) -> float:
        if len(self.history) < 2:
            return 0.0
        a, b = self.history[0], self.history[-1]
        dm = b.get("moves", 0) - a.get("moves", 0)
        dt = b["t"] - a["t"]
        return dm / dt if dt > 0 else 0.0


def stderr_logger(jsonl_path: Optional[str] = None) -> MetricsLogger:
    return MetricsLogger(stream=sys.stderr, jsonl_path=jsonl_path)
