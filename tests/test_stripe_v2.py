"""Parity tests for the v2 stripe kernel (ops/stripe_v2.py): the static-op
window-coordinate DP + run-jump traceback must produce Edits exactly equal to
the host banded aligner (align/map_variations.py), which itself is pinned
against the reference fixtures (align_with_nextclade.rs:90-141)."""
import numpy as np
import pytest

from pangraph_tpu.align.map_variations import map_variations
from pangraph_tpu.align.params import BandedAlignParams, BandParameters
from pangraph_tpu.graph.seq import as_seq
from pangraph_tpu.ops.stripe_v2 import G, edit_from_events, stripe_align_v2

ACGT = np.frombuffer(b"ACGT", np.uint8)


def mutate(ref, n_sub, n_ins, n_del, rng):
    q = list(ref)
    for _ in range(n_del):
        p = int(rng.integers(1, len(q) - 1))
        L = int(rng.integers(1, 6))
        del q[p : p + L]
    for _ in range(n_ins):
        p = int(rng.integers(1, len(q) - 1))
        L = int(rng.integers(1, 6))
        q[p:p] = list(ACGT[rng.integers(0, 4, L)])
    q = np.array(q, np.uint8)
    idx = rng.choice(len(q), min(n_sub, len(q)), replace=False)
    q[idx] = ACGT[rng.integers(0, 4, len(idx))]
    return q


def align_v2(ref, qry, ms, B, R_cap):
    m_pad = G
    rlen = np.zeros(m_pad, np.int32)
    qlen = np.zeros(m_pad, np.int32)
    msv = np.zeros(m_pad, np.int32)
    Wv = np.full(m_pad, (B - 2) // 2, np.int32)
    ref_seq = np.zeros((m_pad, R_cap), np.uint8)
    qry_seq = np.zeros((m_pad, R_cap + B), np.uint8)
    ref_seq[0, : len(ref)] = ref
    qry_seq[0, : len(qry)] = qry
    rlen[0], qlen[0], msv[0] = len(ref), len(qry), ms
    gmax = rlen.reshape(-1, G).max(axis=1).astype(np.int32)
    out = stripe_align_v2(ref_seq, qry_seq, rlen, qlen, msv, Wv, gmax, R_cap, B, 512)
    rows = np.asarray(out["rows"])[0]
    words = np.asarray(out["words"])[0]
    ne = int(np.asarray(out["n_events"])[0])
    meta = np.asarray(out["meta"])[0]
    edit, ok = edit_from_events(rows, words, ne, meta, ref, qry)
    assert ok, f"walk dead/overflow: meta={meta} ne={ne}"
    return edit


@pytest.mark.parametrize("kind", ["identical", "subs", "mixed", "heavy"])
def test_v2_matches_host_aligner(kind):
    rng = np.random.default_rng(hash(kind) % 2**32)
    B, R_cap = 128, 512
    for trial in range(3):
        n = int(rng.integers(150, 480))
        ref = ACGT[rng.integers(0, 4, n)]
        if kind == "identical":
            qry = ref.copy()
        elif kind == "subs":
            qry = mutate(ref, 10, 0, 0, rng)
        elif kind == "mixed":
            qry = mutate(ref, 5, 3, 3, rng)
        else:
            qry = mutate(ref, 15, 5, 5, rng)
        edit = align_v2(ref, qry, 0, B, R_cap)
        assert np.array_equal(edit.apply(ref), qry)
        host = map_variations(ref, qry, BandParameters(0, (B - 2) // 2), BandedAlignParams(), 0)
        assert edit == host


def test_v2_terminal_gaps_and_shift():
    rng = np.random.default_rng(7)
    B, R_cap = 128, 512
    ref = ACGT[rng.integers(0, 4, 300)]
    for ref2, qry in [(ref, ref[20:]), (ref, ref[:-25]), (ref[30:], ref), (ref[:-30], ref)]:
        edit = align_v2(as_seq(ref2), as_seq(qry), 0, B, R_cap)
        assert np.array_equal(edit.apply(as_seq(ref2)), as_seq(qry))
    qry = mutate(ref, 8, 2, 2, rng)
    for ms in (17, -13):
        edit = align_v2(ref, qry, ms, B, R_cap)
        host = map_variations(ref, qry, BandParameters(ms, (B - 2) // 2), BandedAlignParams(), 0)
        assert edit == host


def test_v2_multichunk():
    rng = np.random.default_rng(11)
    B = 128
    ref = ACGT[rng.integers(0, 4, 900)]
    qry = mutate(ref, 20, 4, 4, rng)
    edit = align_v2(ref, qry, 0, B, 1024)
    host = map_variations(ref, qry, BandParameters(0, (B - 2) // 2), BandedAlignParams(), 0)
    assert edit == host


def test_v2_non_power_of_two_tier_10240():
    """The 10240 R-cap tier (5 * 2048 — not a power of two) must satisfy the
    walk kernel's chunk-divisor selection (stripe_v2.walk_v2 picks the
    largest power-of-two chunk that divides R_cap) and stay edit-exact."""
    rng = np.random.default_rng(23)
    B = 128
    ref = ACGT[rng.integers(0, 4, 9000)]
    qry = mutate(ref, 90, 6, 6, rng)
    edit = align_v2(ref, qry, 0, B, 10240)
    host = map_variations(ref, qry, BandParameters(0, (B - 2) // 2), BandedAlignParams(), 0)
    assert edit == host


def test_v2_packed_inputs_match_raw():
    """stripe_align_v2_packed (nibble-packed H2D inputs) must be
    output-identical to the raw-byte wrapper."""
    import numpy as np

    from pangraph_tpu.graph.seq import IUPAC_MASK
    from pangraph_tpu.ops.stripe_v2 import pack_nibbles_host, stripe_align_v2, stripe_align_v2_packed

    rng = np.random.default_rng(29)
    m, B, R_cap, L = 8, 128, 512, 400
    ref_seq = np.zeros((m, R_cap), np.uint8)
    qry_seq = np.zeros((m, R_cap + B), np.uint8)
    for s in range(m):
        r = ACGT[rng.integers(0, 4, L)]
        q = mutate(r, 8, 2, 2, rng)
        ref_seq[s, : len(r)] = r
        qry_seq[s, : len(q)] = q
    rlen = np.full(m, L, np.int32)
    qlen = np.array([np.count_nonzero(qry_seq[s]) for s in range(m)], np.int32)
    ms = np.zeros(m, np.int32)
    W = np.full(m, (B - 2) // 2, np.int32)
    gmax = rlen.reshape(-1, 8).max(axis=1).astype(np.int32)
    raw = stripe_align_v2(ref_seq, qry_seq, rlen, qlen, ms, W, gmax, R_cap, B, 256, 8)
    packed = stripe_align_v2_packed(
        pack_nibbles_host(IUPAC_MASK[ref_seq]), pack_nibbles_host(IUPAC_MASK[qry_seq]),
        rlen, qlen, ms, W, gmax, R_cap, B, 256, 8,
    )
    for k in ("rows", "words", "n_events", "meta"):
        np.testing.assert_array_equal(np.asarray(raw[k]), np.asarray(packed[k]))
