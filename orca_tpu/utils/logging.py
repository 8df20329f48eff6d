"""Structured metrics logging (the reference only has print(flush=True),
train_h1esc_a.py:168; here: JSONL + stdout)."""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, workdir: Optional[str] = None, name: str = "train"):
        self.path = None
        if workdir:
            os.makedirs(workdir, exist_ok=True)
            self.path = os.path.join(workdir, f"{name}.metrics.jsonl")
        self._t0 = time.time()

    def log(self, step: int, **metrics):
        # Multi-process runs: only process 0 emits (every trainer calls
        # log() on every process — unguarded, each JSONL row would appear
        # process_count times and stdout would interleave).
        import jax

        if jax.process_index() != 0:
            return None
        rec = {"step": step, "elapsed_s": round(time.time() - self._t0, 1)}
        rec.update(
            {k: (float(v) if hasattr(v, "__float__") else v)
             for k, v in metrics.items()}
        )
        line = json.dumps(rec)
        print(line, flush=True)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        return rec
