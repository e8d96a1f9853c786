"""jax.distributed multi-process execution (VERDICT r4 item 3).

Two worker processes x 4 virtual CPU devices each: a shared jax.distributed
runtime (global mesh of 8 devices, proven live by a psum collective), the
merge tree split via the TCP claim/exchange coordinator, and each claimed
merge's alignment batches sharded over the worker's per-process local mesh.
Both workers must finish with the identical final graph.
"""
from __future__ import annotations

import pytest

from pangraph_tpu.parallel.distributed import launch_local_cluster


@pytest.mark.slow
def test_two_process_distributed_build():
    results = launch_local_cluster(n_processes=2, virtual_devices=4, genomes=6, length=900)
    assert len(results) == 2
    # identical final graphs (launch_local_cluster already raises otherwise;
    # asserted again for the test report)
    assert results[0]["digest"] == results[1]["digest"]
    assert results[0]["blocks"] >= 2, "workload should produce a multi-block graph"
    for r in results:
        # per-process mesh: 4 local devices; shared runtime: 8 global
        assert r["local_devices"] == 4
        assert r["global_devices"] == 8
        # the global-mesh psum saw every device of both processes
        assert r["psum"] == 8.0
    # the merge tree was coordinated: every granted claim is unique, and
    # nothing was computed twice (6 genomes -> 5 internal merges)
    total_claims = sum(r["merges_claimed"] for r in results)
    assert 1 <= total_claims <= 5
