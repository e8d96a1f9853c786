"""Parity of the checkpointed device pipeline (stripe_dp_ckpt + walk_ckpt)
against the standard v2 kernel: identical event lists and meta for every
problem. The checkpoint path re-derives each walk window's path records from
window-start carries, so Mbp-scale problems fit on device without the
O(R * band) HBM paths buffer."""
from __future__ import annotations

import numpy as np
import pytest

from pangraph_tpu.ops.stripe_v2 import DP_C, ckpt_layout, stripe_align_v2, stripe_align_v2_ckpt

ACGT = np.frombuffer(b"ACGT", np.uint8)
GS = 8


def _batch(rng, m, R_cap, B, L):
    ref_seq = np.zeros((m, R_cap), np.uint8)
    qry_seq = np.zeros((m, R_cap + B), np.uint8)
    rlen = np.zeros(m, np.int32)
    qlen = np.zeros(m, np.int32)
    ms = np.zeros(m, np.int32)
    W = np.full(m, (B - 2) // 2, np.int32)
    for s in range(m):
        Ls = L - s * 137
        r = ACGT[rng.integers(0, 4, Ls)]
        q = list(r)
        for i in rng.choice(Ls, Ls // 40, replace=False):
            q[i] = ACGT[rng.integers(0, 4)]
        for _ in range(3):
            i = int(rng.integers(10, len(q) - 10))
            Li = int(rng.integers(1, 9))
            if rng.random() < 0.5:
                del q[i : i + Li]
            else:
                q[i:i] = list(ACGT[rng.integers(0, 4, Li)])
        q = np.array(q, np.uint8)
        ref_seq[s, : len(r)] = r
        qry_seq[s, : len(q)] = q
        rlen[s], qlen[s] = len(r), len(q)
        ms[s] = int(rng.integers(-5, 5))
    gmax = rlen.reshape(-1, GS).max(axis=1).astype(np.int32)
    return ref_seq, qry_seq, rlen, qlen, ms, W, gmax


@pytest.mark.parametrize("B,L", [(128, 3000), (256, 2500)])
def test_ckpt_pipeline_matches_v2(B, L):
    rng = np.random.default_rng(2)
    R_cap, m, K = 4096, 8, 256
    WV, n_qb = ckpt_layout(B)
    S = WV // DP_C
    args = _batch(rng, m, R_cap, B, L)
    a = stripe_align_v2(*args, R_cap, B, K, GS)
    b = stripe_align_v2_ckpt(*args, R_cap, B, K, S, n_qb, GS)
    for s in range(m):
        na, nb = int(a["n_events"][s]), int(b["n_events"][s])
        assert na == nb, s
        assert np.array_equal(np.asarray(a["rows"][s][:na]), np.asarray(b["rows"][s][:nb])), s
        assert np.array_equal(np.asarray(a["words"][s][:na]), np.asarray(b["words"][s][:nb])), s
        assert np.array_equal(np.asarray(a["meta"][s]), np.asarray(b["meta"][s])), s


def test_ckpt_packed_inputs_match_raw():
    """stripe_align_v2_ckpt_packed (nibble-packed H2D inputs, the Mbp-tier
    production path) must match the raw-byte ckpt wrapper on the valid
    event prefix and meta."""
    from pangraph_tpu.graph.seq import IUPAC_MASK
    from pangraph_tpu.ops.stripe_v2 import pack_nibbles_host, stripe_align_v2_ckpt_packed

    rng = np.random.default_rng(7)
    R_cap, m, B, K, L = 4096, 8, 128, 256, 3000
    WV, n_qb = ckpt_layout(B)
    S = WV // DP_C
    args = _batch(rng, m, R_cap, B, L)
    raw = stripe_align_v2_ckpt(*args, R_cap, B, K, S, n_qb, GS)
    ref_seq, qry_seq, *rest = args
    packed = stripe_align_v2_ckpt_packed(
        pack_nibbles_host(IUPAC_MASK[ref_seq]), pack_nibbles_host(IUPAC_MASK[qry_seq]),
        *rest, R_cap, B, K, S, n_qb, GS,
    )
    for s in range(m):
        na, nb = int(raw["n_events"][s]), int(packed["n_events"][s])
        assert na == nb, s
        assert np.array_equal(np.asarray(raw["rows"][s][:na]), np.asarray(packed["rows"][s][:nb])), s
        assert np.array_equal(np.asarray(raw["words"][s][:na]), np.asarray(packed["words"][s][:nb])), s
        assert np.array_equal(np.asarray(raw["meta"][s]), np.asarray(packed["meta"][s])), s
