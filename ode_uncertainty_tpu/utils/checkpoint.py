"""Checkpoint/resume for long estimation sweeps.

The reference writes results once at the end — a killed 100-restart run
loses everything (SURVEY.md §5). Here the restart axis is processed in
host-level chunks and each completed chunk is appended to a sidecar
checkpoint; on resume, completed chunks are skipped. Restart draws are
deterministic in the seed, so the checkpoint only needs results.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, List, Optional

import numpy as np


def _ckpt_path(output: str) -> Path:
    return Path(str(output) + ".ckpt.npz")


def run_chunked(
    output: str,
    num_items: int,
    chunk_size: int,
    run_chunk: Callable[[int, int], dict],
    resume: bool = True,
) -> dict:
    """Runs ``run_chunk(start, stop) -> {name: array[stop-start, ...]}`` over
    [0, num_items) in chunks, checkpointing after each; returns concatenated
    results and removes the sidecar on success."""
    ckpt = _ckpt_path(output)
    done: List[dict] = []
    start = 0
    if resume and ckpt.exists():
        with np.load(ckpt, allow_pickle=False) as z:
            start = int(z["__next_start__"])
            names = [k for k in z.files if not k.startswith("__")]
            if start > 0:
                done.append({k: z[k] for k in names})
        print(f"resuming from checkpoint: {start}/{num_items} restarts done")

    while start < num_items:
        stop = min(start + chunk_size, num_items)
        res = run_chunk(start, stop)
        done.append({k: np.asarray(v) for k, v in res.items()})
        start = stop
        merged = {
            k: np.concatenate([d[k] for d in done]) for k in done[0]
        }
        ckpt.parent.mkdir(parents=True, exist_ok=True)
        np.savez(ckpt, __next_start__=np.asarray(start), **merged)

    merged = {k: np.concatenate([d[k] for d in done]) for k in done[0]} if done else {}
    if ckpt.exists():
        ckpt.unlink()
    return merged
