"""Lightweight phase tracing (SURVEY.md §5: the reference has no built-in
tracer — `dev/profile` wraps samply externally; here tracing is first-class).

Enable with PANGRAPH_TPU_TRACE=1 or `pangraph-tpu build --trace`. Every
`span("phase")` accumulates wall time and call counts per phase name
(thread-safe); `summary()` renders a per-phase table, and `report()` logs it.
Spans are no-ops when tracing is disabled (~100 ns overhead).
"""
from __future__ import annotations

import contextlib
import logging
import os
import threading
import time

log = logging.getLogger(__name__)

_LOCK = threading.Lock()
_STATS: dict = {}  # name -> [count, total_s, max_s]
_ENABLED = bool(int(os.environ.get("PANGRAPH_TPU_TRACE", "0") or 0))


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def enabled() -> bool:
    return _ENABLED


def reset() -> None:
    with _LOCK:
        _STATS.clear()


@contextlib.contextmanager
def span(name: str):
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _LOCK:
            s = _STATS.setdefault(name, [0, 0.0, 0.0])
            s[0] += 1
            s[1] += dt
            s[2] = max(s[2], dt)


def stats() -> dict:
    with _LOCK:
        return {k: tuple(v) for k, v in _STATS.items()}


def summary() -> str:
    rows = sorted(stats().items(), key=lambda kv: -kv[1][1])
    if not rows:
        return "trace: no spans recorded"
    width = max(len(k) for k, _ in rows)
    lines = [f"{'phase':<{width}}  {'calls':>6}  {'total_s':>9}  {'mean_ms':>9}  {'max_ms':>9}"]
    for name, (n, tot, mx) in rows:
        lines.append(f"{name:<{width}}  {n:>6}  {tot:>9.3f}  {tot / n * 1e3:>9.2f}  {mx * 1e3:>9.2f}")
    return "\n".join(lines)


def report() -> None:
    if _ENABLED:
        log.info("phase timings:\n%s", summary())
