"""Wall-clock phase accounting for the production pipeline.

Enabled by bench.py (and AUDIOWMARK_PROFILE_PHASES=1) to attribute the
production add/get wall time to pipeline phases: file IO, host prep, the
device dispatch+fetch points, candidate selection, Viterbi.  JAX dispatch is
asynchronous, so a phase's time is where the HOST blocks (enqueue cost, or
the synchronizing fetch that absorbs all enqueued device/transfer work) —
the right attribution for a wall-clock breakdown.

Near-zero overhead when disabled (one attribute check per phase)."""

from __future__ import annotations

import collections
import contextlib
import os
import time

enabled = bool(int(os.environ.get("AUDIOWMARK_PROFILE_PHASES", "0") or 0))
totals = collections.defaultdict(float)
counts = collections.defaultdict(int)


@contextlib.contextmanager
def phase(name: str):
    if not enabled:
        yield
        return
    t0 = time.monotonic()
    try:
        yield
    finally:
        totals[name] += time.monotonic() - t0
        counts[name] += 1


def reset() -> None:
    totals.clear()
    counts.clear()


def report() -> dict:
    """{phase: seconds} sorted by cost, plus call counts."""
    return {k: {"s": round(v, 4), "n": counts[k]}
            for k, v in sorted(totals.items(), key=lambda kv: -kv[1])}
