"""Sequence representation: ASCII uint8 numpy arrays.

The reference stores sequences as `Vec<AsciiChar>` (`representation/seq.rs:8`).
Here a sequence is a 1-D ``np.ndarray(dtype=uint8)`` of ASCII codes — zero-copy
sliceable, concatenatable, directly shippable to device, and hashable via raw
bytes. Helper tables implement IUPAC-aware complement and 2-bit encoding for
kernels.

Complement table mirrors `io/seq.rs:9-29` (IUPAC + 'N' + '-').
"""
from __future__ import annotations

import numpy as np

GAP = ord("-")

# IUPAC complement table (io/seq.rs:9)
_COMP = np.arange(256, dtype=np.uint8)
for a, b in [
    ("A", "T"), ("C", "G"), ("G", "C"), ("T", "A"),
    ("Y", "R"), ("R", "Y"), ("W", "W"), ("S", "S"),
    ("K", "M"), ("M", "K"), ("D", "H"), ("H", "D"),
    ("V", "B"), ("B", "V"), ("N", "N"), ("-", "-"),
]:
    _COMP[ord(a)] = ord(b)
    _COMP[ord(a.lower())] = ord(b.lower())

# Valid DNA alphabet for validation (io/fasta.rs:265: DNA with IUPAC + gap)
_VALID = np.zeros(256, dtype=bool)
for c in "ACGTUYRWSKMDHVBN-acgtuyrwskmdhvbn.?":
    _VALID[ord(c)] = True

# IUPAC 4-bit membership masks: bit0=A bit1=C bit2=G bit3=T.
# Used by the banded aligner's match lookup (nextclade lookup_match_score).
IUPAC_MASK = np.zeros(256, dtype=np.uint8)
for c, m in {
    "A": 0b0001, "C": 0b0010, "G": 0b0100, "T": 0b1000, "U": 0b1000,
    "R": 0b0101, "Y": 0b1010, "S": 0b0110, "W": 0b1001,
    "K": 0b1100, "M": 0b0011, "B": 0b1110, "D": 0b1101,
    "H": 0b1011, "V": 0b0111, "N": 0b1111,
}.items():
    IUPAC_MASK[ord(c)] = m
    IUPAC_MASK[ord(c.lower())] = m

# 2-bit encoding for sketch kernels: A=0 C=1 G=2 T=3, everything else = 4 (ambiguous)
TWOBIT = np.full(256, 4, dtype=np.uint8)
for i, c in enumerate("ACGT"):
    TWOBIT[ord(c)] = i
    TWOBIT[ord(c.lower())] = i


def as_seq(s) -> np.ndarray:
    """Coerce str/bytes/array to a uint8 ASCII array."""
    if isinstance(s, np.ndarray):
        return np.ascontiguousarray(s, dtype=np.uint8)
    if isinstance(s, str):
        s = s.encode()
    return np.frombuffer(bytes(s), dtype=np.uint8).copy()


def to_str(seq: np.ndarray) -> str:
    return seq.tobytes().decode()


def revcomp(seq: np.ndarray) -> np.ndarray:
    return _COMP[seq[::-1]]


def complement(seq: np.ndarray) -> np.ndarray:
    return _COMP[seq]


def validate_alphabet(seq: np.ndarray, name: str = "") -> None:
    bad = ~_VALID[seq]
    if bad.any():
        i = int(np.argmax(bad))
        raise ValueError(f"Invalid character {chr(int(seq[i]))!r} at position {i} in sequence {name!r}")
