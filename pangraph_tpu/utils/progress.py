"""Terminal progress bar for the merge loop (reference: indicatif bar ticked
once per completed merge, TTY-only — utils/progress_bar.rs:13-34,
build_run.rs:107,131)."""
from __future__ import annotations

import sys
import threading
import time


class ProgressBar:
    """Minimal stderr progress bar; silent when stderr is not a TTY or when
    disabled. Thread-safe (the parallel merge scheduler ticks from workers)."""

    def __init__(self, total: int, label: str = "merging", enabled: bool = True):
        self.total = max(total, 1)
        self.label = label
        self.n = 0
        self.t0 = time.time()
        self.enabled = enabled and sys.stderr.isatty()
        self._lock = threading.Lock()
        if self.enabled:
            self._draw()

    def tick(self, note: str = "") -> None:
        with self._lock:
            self.n += 1
            if self.enabled:
                self._draw(note)

    def _draw(self, note: str = "") -> None:
        frac = self.n / self.total
        width = 30
        filled = int(frac * width)
        bar = "#" * filled + "-" * (width - filled)
        dt = time.time() - self.t0
        sys.stderr.write(f"\r{self.label} [{bar}] {self.n}/{self.total} ({dt:.0f}s) {note[:40]:<40}")
        if self.n >= self.total:
            sys.stderr.write("\n")
        sys.stderr.flush()

    def close(self) -> None:
        if self.enabled and self.n < self.total:
            sys.stderr.write("\n")
            sys.stderr.flush()
