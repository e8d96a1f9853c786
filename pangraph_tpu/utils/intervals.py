"""Half-open interval helpers (reference: utils/interval.rs)."""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Interval:
    start: int
    end: int

    def __len__(self) -> int:
        return self.end - self.start

    def contains(self, pos: int) -> bool:
        return self.start <= pos < self.end

    def has_overlap_with(self, other: "Interval") -> bool:
        return self.start < other.end and other.start < self.end

    def to_tuple(self):
        return (self.start, self.end)


def have_no_overlap(intervals, candidate: Interval) -> bool:
    return not any(i.has_overlap_with(candidate) for i in intervals)


def positions_to_intervals(positions) -> list:
    """Merge a set of integer positions into maximal contiguous [start, end)
    intervals (utils/interval.rs positions_to_intervals)."""
    out = []
    for p in sorted(set(positions)):
        if out and out[-1].end == p:
            out[-1] = Interval(out[-1].start, p + 1)
        else:
            out.append(Interval(p, p + 1))
    return out
