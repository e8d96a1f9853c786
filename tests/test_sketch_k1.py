"""Parity tests for the K1 Pallas sketch kernel (ops/sketch_k1.py) against
sketch_numpy (align/minimizer.py), which is itself the parity reference for
the native C++ sketch. Both mash (w=100, k=15) and mapping (w=19, k=19)
parameterizations, including invalid (N) bases, lowercase input, and
palindromic-kmer skipping."""
from __future__ import annotations

import numpy as np
import pytest

from pangraph_tpu.align.minimizer import jenkins_hash, sketch_numpy
from pangraph_tpu.ops.sketch_k1 import sketch_pallas

ACGTN = np.frombuffer(b"ACGTN", np.uint8)


def _assert_parity(seq, k, w, ctx):
    got = sketch_pallas(seq, k, w)
    want = sketch_numpy(seq, k, w)
    assert np.array_equal(got.values, want.values), ctx
    assert np.array_equal(got.positions, want.positions), ctx
    assert np.array_equal(got.strands, want.strands), ctx


@pytest.mark.parametrize("k,w", [(15, 100), (19, 19), (7, 5)])
def test_sketch_k1_parity_random(k, w):
    rng = np.random.default_rng(5)
    for trial in range(6):
        L = int(rng.integers(w + k, 4000))
        seq = ACGTN[rng.choice(5, L, p=[0.24, 0.24, 0.24, 0.24, 0.04])]
        if trial % 3 == 0:
            seq = np.frombuffer(bytes(seq).lower(), np.uint8).copy()
        _assert_parity(seq, k, w, (trial, k, w))


def test_sketch_k1_multi_chunk():
    """Sequences spanning several lane chunks (window min crosses chunk
    boundaries through the halo view)."""
    rng = np.random.default_rng(6)
    seq = ACGTN[rng.choice(5, 5000, p=[0.2475] * 4 + [0.01])]
    _assert_parity(seq, 15, 100, "multichunk")
    _assert_parity(seq, 19, 19, "multichunk")


def test_sketch_k1_palindromes_skipped():
    """A sequence of palindromic k-mers (fwd == revcomp) yields no minimizers
    on either path."""
    seq = np.frombuffer(b"AT" * 200, np.uint8).copy()
    got = sketch_pallas(seq, 8, 10)  # even k: ATAT... kmers are palindromic
    want = sketch_numpy(seq, 8, 10)
    assert len(got.values) == len(want.values)
    assert np.array_equal(got.values, want.values)


def test_sketch_k1_short_and_empty():
    for L in (0, 5, 30):
        seq = ACGTN[np.zeros(L, np.int64)]
        got = sketch_pallas(seq, 19, 19)
        want = sketch_numpy(seq, 19, 19)
        assert np.array_equal(got.values, want.values)


def test_jenkins_u64_emulation_matches_numpy():
    """The (hi, lo) uint32 emulation of the Jenkins mix must equal the numpy
    uint64 implementation bit-for-bit."""
    import jax

    from pangraph_tpu.ops.sketch_k1 import _jenkins_u64

    rng = np.random.default_rng(7)
    for k in (15, 19, 31):
        mask = (1 << (2 * k)) - 1
        x = rng.integers(0, mask + 1, size=(8, 128), dtype=np.uint64)
        hi = (x >> np.uint64(32)).astype(np.uint32).view(np.int32)
        lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        ghi, glo = jax.jit(
            lambda h, l, m=mask: _jenkins_u64(h, l, (m >> 32) & 0xFFFFFFFF, m & 0xFFFFFFFF)
        )(hi, lo)
        got = (
            np.asarray(ghi).view(np.uint32).astype(np.uint64) << np.uint64(32)
        ) | np.asarray(glo).view(np.uint32).astype(np.uint64)
        want = jenkins_hash(x, mask)
        assert np.array_equal(got, want), k
