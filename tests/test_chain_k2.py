"""Parity tests for the K2 Pallas chaining kernel (ops/chain_k2.py) against
the sequential host DP (align/chain.py), which is itself parity-locked with
native/chain.cpp. Scores AND parents must be bit-identical — including
nearest-predecessor tie-breaks — so chain extraction is unchanged."""
from __future__ import annotations

import numpy as np
import pytest

from pangraph_tpu.align.chain import NEG as HOST_NEG, ChainParams
from pangraph_tpu.ops.chain_k2 import chain_dp_pallas


def _host_dp(r, q, p: ChainParams):
    """The sequential reference DP (the numpy branch of chain_anchors,
    without the native shortcut), on (r, q) already sorted."""
    n = len(r)
    H = min(p.window, n)
    idx = np.arange(n)[:, None] - 1 - np.arange(H)[None, :]
    valid = idx >= 0
    idx_c = np.maximum(idx, 0)
    dr = r[:, None] - r[idx_c]
    dq = q[:, None] - q[idx_c]
    dd = np.abs(dr - dq)
    ok = valid & (dr > 0) & (dq > 0) & (dr <= p.max_gap) & (dq <= p.max_gap) & (dd <= p.bw)
    alpha = np.minimum(np.minimum(dq, dr), p.k)
    with np.errstate(divide="ignore"):
        log_dd = np.where(dd > 0, np.log2(np.maximum(dd, 1)).astype(np.int64), 0)
    gap_cost = (dd * p.k) // 100 + (log_dd >> 1)
    contrib = np.where(ok, alpha - gap_cost, HOST_NEG)
    f = np.full(n, p.k, dtype=np.int64)
    parent = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        c = contrib[i]
        cand = np.where(c > HOST_NEG, f[idx_c[i]] + c, HOST_NEG)
        h = int(np.argmax(cand))
        if c[h] > HOST_NEG and cand[h] > p.k:
            f[i] = cand[h]
            parent[i] = idx_c[i][h]
    return f, parent


def _anchors(rng, n, L, n_chains=3, jitter=0.02):
    """Plausible anchor clouds: a few co-linear chains plus noise anchors."""
    rs, qs = [], []
    for c in range(n_chains):
        m = n // (n_chains + 1)
        start_r = int(rng.integers(0, L // 2))
        start_q = int(rng.integers(0, L // 2))
        steps = rng.integers(5, 400, m)
        r = start_r + np.cumsum(steps)
        drift = np.cumsum(rng.integers(-3, 4, m))
        q = start_q + np.cumsum(steps) + drift
        rs.append(r)
        qs.append(q)
    m = n - sum(len(x) for x in rs)
    rs.append(rng.integers(0, L, m))
    qs.append(rng.integers(0, L, m))
    r = np.concatenate(rs)
    q = np.concatenate(qs)
    order = np.lexsort((q, r))
    return r[order].astype(np.int64), q[order].astype(np.int64)


@pytest.mark.parametrize("n", [50, 1000, 1500, 4100])
def test_chain_k2_parity(n):
    rng = np.random.default_rng(n)
    r, q = _anchors(rng, n, L=200_000)
    p = ChainParams()
    f0, p0 = _host_dp(r, q, p)
    f1, p1 = chain_dp_pallas(r, q, p.k, p.max_gap, p.bw, p.window)
    assert np.array_equal(f0, f1)
    assert np.array_equal(p0, p1)


def test_chain_k2_cross_block_chains():
    """Chains crossing the 1024-anchor block boundary must keep exact scores
    and parents (the carry-tile path)."""
    # one long dense chain spanning several blocks
    n = 3000
    r = np.cumsum(np.full(n, 25, np.int64))
    q = r + np.arange(n) % 3  # small consistent drift
    p = ChainParams()
    f0, p0 = _host_dp(r, q, p)
    f1, p1 = chain_dp_pallas(r, q, p.k, p.max_gap, p.bw, p.window)
    assert np.array_equal(f0, f1)
    assert np.array_equal(p0, p1)
    # the chain really does accumulate across blocks
    assert f0[-1] > f0[1000]


def test_chain_k2_empty_and_tiny():
    f, par = chain_dp_pallas(np.zeros(0, np.int64), np.zeros(0, np.int64), 19, 10_000, 1_000, 32)
    assert len(f) == 0 and len(par) == 0
    r = np.array([100, 150], np.int64)
    q = np.array([100, 150], np.int64)
    f, par = chain_dp_pallas(r, q, 19, 10_000, 1_000, 32)
    f0, p0 = _host_dp(r, q, ChainParams())
    assert np.array_equal(f, f0) and np.array_equal(par, p0)
