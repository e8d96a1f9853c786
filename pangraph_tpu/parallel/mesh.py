"""Multi-chip execution: shard alignment batches over a device mesh.

The reference's parallelism is a rayon thread pool over promises/nodes
(SURVEY.md §2.4). The TPU mapping: the job axis of one merge round's
re-alignment batch is sharded data-parallel across chips with
jax.sharding.Mesh + NamedSharding; XLA partitions the vmapped stripe kernel
with no collectives in the hot loop (embarrassingly parallel over jobs), so
scaling rides ICI only for the result gather.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, axis: str = "jobs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_jobs(mesh: Mesh, *arrays, axis: str = "jobs"):
    """Place batch arrays with the leading (job) axis sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return [jax.device_put(a, sharding) for a in arrays]


def make_mesh_aligner(n_devices: int = None, params=None, extra_band_width: int = 5, max_attempts: int = 4):
    """A TpuBatchAligner whose bucket batches are sharded data-parallel over
    a 'jobs' device mesh (shard_map; one Pallas kernel instance per chip)."""
    from pangraph_tpu.ops.batch_align import TpuBatchAligner

    mesh = make_mesh(n_devices)
    return TpuBatchAligner(params, extra_band_width, max_attempts, mesh=mesh)


def sharded_stripe_round(n_devices: int, R_cap: int = 1024, B: int = 128) -> None:
    """One data-parallel alignment round over an n-device mesh, on the
    production v2 kernel: shard_map over the job axis runs one Pallas stripe
    DP + traceback per shard (no collectives in the hot loop), then a psum
    across the mesh exercises the collective used by distributed reconsensus
    majority voting. Used by the driver's multi-chip dry run."""
    import os

    # multi-chip hardware is not attached in this environment: force the
    # virtual CPU mesh if the requested size exceeds what's available. Must
    # happen before backend init; the axon plugin ignores JAX_PLATFORMS env.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + f" --xla_force_host_platform_device_count={n_devices}").strip()
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from jax.experimental.shard_map import shard_map

    from pangraph_tpu.ops.stripe_v2 import G, stripe_align_v2

    mesh = make_mesh(n_devices)
    batch = G * n_devices  # one kernel group per device
    K = 128
    rng = np.random.default_rng(0)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    n = 700  # crosses multiple DP chunks
    ref_seq = np.zeros((batch, R_cap), np.uint8)
    qry_seq = np.zeros((batch, R_cap + B), np.uint8)
    rlen = np.zeros(batch, np.int32)
    qlen = np.zeros(batch, np.int32)
    for s in range(batch):
        r = ACGT[rng.integers(0, 4, n)]
        q = r.copy()
        idx = rng.choice(n, 12, replace=False)
        q[idx] = ACGT[rng.integers(0, 4, 12)]
        ref_seq[s, :n] = r
        qry_seq[s, :n] = q
        rlen[s], qlen[s] = n, n
    ms = np.zeros(batch, np.int32)
    W = np.full(batch, (B - 2) // 2, np.int32)
    gmax = rlen.reshape(-1, G).max(axis=1).astype(np.int32)

    def step(ref_seq, qry_seq, rlen, qlen, ms, W, gmax):
        out = stripe_align_v2(ref_seq, qry_seq, rlen, qlen, ms, W, gmax, R_cap, B, K)
        # collective: global event count across the mesh (the same psum shape
        # distributed reconsensus majority voting uses)
        total = jax.lax.psum(jnp.sum(out["n_events"]), "jobs")
        return out["meta"], out["n_events"], total

    jobs = P("jobs")
    rep = P()
    fn = jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(jobs, jobs, jobs, jobs, jobs, jobs, jobs),
            out_specs=(jobs, jobs, rep),
            check_rep=False,
        )
    )
    meta, n_events, total = fn(ref_seq, qry_seq, rlen, qlen, ms, W, gmax)
    jax.block_until_ready((meta, n_events, total))
    assert meta.shape == (batch, 4)
    meta_h = np.asarray(meta)
    assert not meta_h[:, 1].any(), "dead walks in dry run"
    assert int(np.asarray(total)) == int(np.asarray(n_events).sum())
