"""Mapper pair cache (round-over-round reuse in the self-merge loop)."""
from __future__ import annotations

import numpy as np

from pangraph_tpu.align.mapper import MapperParams, map_all_vs_all

ACGT = np.frombuffer(b"ACGT", np.uint8)


def _seqs(seed=0, n=4, L=3000):
    rng = np.random.default_rng(seed)
    base = ACGT[rng.integers(0, 4, L)]
    out = {}
    for i in range(n):
        g = base.copy()
        idx = rng.choice(L, L // 100, replace=False)
        g[idx] = ACGT[rng.integers(0, 4, len(idx))]
        out[f"b{i}"] = g
    return out


def _key(a):
    return (a.qry.name, a.reff.name, a.qry.interval.start, a.qry.interval.end,
            a.reff.interval.start, a.reff.interval.end, a.matches, tuple(a.cigar))


def test_pair_cache_replays_unchanged_pairs():
    p = MapperParams.from_sensitivity(10, 100, None)
    seqs = _seqs()
    fresh = map_all_vs_all(dict(seqs), p)
    cache = {}
    first = map_all_vs_all(dict(seqs), p, pair_cache=cache)
    assert sorted(map(_key, first)) == sorted(map(_key, fresh))
    # second round, nothing changed: all pairs replayed from the cache,
    # selection output identical
    second = map_all_vs_all(dict(seqs), p, pair_cache=cache)
    assert sorted(map(_key, second)) == sorted(map(_key, fresh))


def test_pair_cache_recomputes_changed_blocks():
    p = MapperParams.from_sensitivity(10, 100, None)
    seqs = _seqs()
    cache = {}
    map_all_vs_all(dict(seqs), p, pair_cache=cache)
    # mutate one block: every pair touching it must be recomputed, pairs
    # among the others replayed — output must equal a cache-free run
    rng = np.random.default_rng(99)
    mutated = dict(seqs)
    g = mutated["b1"].copy()
    idx = rng.choice(len(g), 40, replace=False)
    g[idx] = ACGT[rng.integers(0, 4, len(idx))]
    mutated["b1"] = g
    cached_run = map_all_vs_all(dict(mutated), p, pair_cache=cache)
    fresh_run = map_all_vs_all(dict(mutated), p)
    assert sorted(map(_key, cached_run)) == sorted(map(_key, fresh_run))


def test_pair_cache_invalidates_on_occupancy_drift():
    """ADVICE r4: another block's change can shift a shared minimizer run
    across the max_occ cutoff — the cached pair's anchor set then differs
    from a fresh recompute. Scenario: A and B share segment S once each; C
    carries 10 extra copies of S, pushing S's runs to 12 > max_occ=10, so
    round 1 finds no A-B alignment over S. Round 2 removes C's copies: the
    runs drop to 2 <= max_occ and a FRESH run aligns A-B — the cache must
    invalidate A and B (their occupancy masks changed) instead of replaying
    round 1's empty candidate set."""
    p = MapperParams.from_sensitivity(10, 100, None)
    p.mid_occ_frac = 0.5  # small inputs: make the occupancy quantile bite
    rng = np.random.default_rng(7)
    S = ACGT[rng.integers(0, 4, 600)]
    bgA = ACGT[rng.integers(0, 4, 3000)]
    bgB = ACGT[rng.integers(0, 4, 3000)]
    bgC = ACGT[rng.integers(0, 4, 3000)]
    A = np.concatenate([bgA[:1500], S, bgA[1500:]])
    B = np.concatenate([bgB[:1500], S, bgB[1500:]])
    C1 = np.concatenate([bgC] + [S] * 10)
    C2 = bgC
    cache = {}
    r1 = map_all_vs_all({"A": A, "B": B, "C": C1}, p, pair_cache=cache)
    assert not any({a.qry.name, a.reff.name} == {"A", "B"} for a in r1), (
        "setup: S runs must exceed max_occ in round 1 (no A-B alignment)"
    )
    cached_run = map_all_vs_all({"A": A, "B": B, "C": C2}, p, pair_cache=cache)
    fresh_run = map_all_vs_all({"A": A, "B": B, "C": C2}, p)
    assert any({a.qry.name, a.reff.name} == {"A", "B"} for a in fresh_run), (
        "setup: round 2 must align A-B over S"
    )
    assert sorted(map(_key, cached_run)) == sorted(map(_key, fresh_run))


def test_pair_cache_env_kill_switch(monkeypatch):
    """PANGRAPH_TPU_NO_PAIR_CACHE=1 disables replay: the cache dict stays
    unpopulated and results equal a cache-free run."""
    monkeypatch.setenv("PANGRAPH_TPU_NO_PAIR_CACHE", "1")
    p = MapperParams.from_sensitivity(10, 100, None)
    seqs = _seqs()
    cache = {}
    first = map_all_vs_all(dict(seqs), p, pair_cache=cache)
    assert cache == {}, "kill switch must keep the cache unpopulated"
    fresh = map_all_vs_all(dict(seqs), p)
    assert sorted(map(_key, first)) == sorted(map(_key, fresh))


def test_pair_cache_handles_removed_blocks():
    p = MapperParams.from_sensitivity(10, 100, None)
    seqs = _seqs(n=5)
    cache = {}
    map_all_vs_all(dict(seqs), p, pair_cache=cache)
    smaller = {k: v for k, v in seqs.items() if k != "b2"}
    cached_run = map_all_vs_all(dict(smaller), p, pair_cache=cache)
    fresh_run = map_all_vs_all(dict(smaller), p)
    assert sorted(map(_key, cached_run)) == sorted(map(_key, fresh_run))
    assert not any(a.qry.name == "b2" or a.reff.name == "b2" for a in cached_run)
