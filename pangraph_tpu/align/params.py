"""Alignment parameter sets.

Mirrors the reference defaults:
- banded re-aligner scores: `align/nextclade/align/params.rs:142-176`
  (match 3, mismatch 1, gap open 6, gap extend 0, free terminal gaps,
  left-preferring gap placement, 3 alignment attempts with band doubling)
- graph-merging knobs: `align/alignment_args.rs` (indel_len_threshold 100,
  alpha 100, beta 10, sensitivity 10) and `commands/build/build_args.rs`
  (extra_band_width 5, max_alignment_attempts 4, max_self_map 100).
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class BandedAlignParams:
    score_match: int = 3
    penalty_mismatch: int = 1
    penalty_gap_open: int = 6
    penalty_gap_extend: int = 0
    left_terminal_gaps_free: bool = True
    right_terminal_gaps_free: bool = True
    # left-align gaps on ties (GapAlignmentSide::Left, params.rs:12-16)
    left_align: int = 1
    min_length: int = 1
    max_alignment_attempts: int = 3
    max_band_area: int = 500_000_000


@dataclass
class AlignmentArgs:
    indel_len_threshold: int = 100  # -l
    alpha: float = 100.0  # -a
    beta: float = 10.0  # -b
    sensitivity: int = 10  # -s: minimap2 asm5/10/20 preset
    kmer_length: int = None  # -K


@dataclass
class BuildArgs:
    circular: bool = False
    max_self_map: int = 100  # -x
    extra_band_width: int = 5
    max_alignment_attempts: int = 4
    verify: bool = False
    guide_tree: str = None
    # host worker threads for independent guide-tree merges (reference keeps
    # the merge schedule sequential, build_run.rs:111; we re-enable the
    # tree-level parallelism its tree/balance.rs left disabled)
    jobs: int = 1
    # checkpoint/resume directory: completed merge-tree subgraphs are written
    # here and restored on re-run (build/build.py MergeCheckpointer)
    checkpoint_dir: str = None
    # cross-process coordination: True = workers sharing checkpoint_dir claim
    # merges with O_EXCL markers and wait on each other's checkpoints;
    # "tcp://HOST:PORT" = claims/subgraphs via the TCP coordination server
    # (parallel/coordinator.py) — no shared filesystem needed
    coordinate: "bool | str" = False
    aln_args: AlignmentArgs = field(default_factory=AlignmentArgs)
    banded_params: BandedAlignParams = field(default_factory=BandedAlignParams)

    def __post_init__(self):
        self.banded_params.max_alignment_attempts = self.max_alignment_attempts
        self.banded_params.min_length = 1


@dataclass(frozen=True)
class BandParameters:
    """Diagonal band: mean shift + half-width (align/map_variations.rs:13-37)."""

    mean_shift: int
    band_width: int

    def add(self, other: "BandParameters") -> "BandParameters":
        return BandParameters(self.mean_shift + other.mean_shift, self.band_width + other.band_width)

    @staticmethod
    def from_edits(edit, ref_len: int) -> "BandParameters":
        shift = edit.aln_mean_shift(ref_len)
        if shift is None:
            raise ValueError(f"Edit has no aligned positions (ref_len={ref_len})")
        bw = edit.aln_bandwidth(ref_len, shift)
        if bw is None:
            raise ValueError("Edit has no aligned positions for bandwidth")
        return BandParameters(shift, bw)
