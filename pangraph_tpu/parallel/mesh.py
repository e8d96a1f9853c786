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


class MeshBatchAligner:
    """TpuBatchAligner variant that shards each bucket batch across a mesh.

    Pads the job axis to a multiple of the mesh size, then runs the same
    bucketed kernel; XLA executes each shard on its own chip.
    """

    def __init__(self, mesh: Mesh, inner):
        self.mesh = mesh
        self.inner = inner
        inner._mesh = mesh  # batch_align checks for _mesh to shard inputs

    def align_many(self, jobs):
        return self.inner.align_many(jobs)

    def __call__(self, ref, seqs, bands):
        return self.inner(ref, seqs, bands)


def sharded_stripe_round(n_devices: int, R_pad: int = 256, B: int = 128) -> None:
    """One data-parallel alignment round over an n-device mesh: build tiny
    per-job inputs, shard the job axis, jit + run the full kernel step.
    Used by the driver's multi-chip dry run."""
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

    from pangraph_tpu.ops.stripe_tpu import stripe_batch

    mesh = make_mesh(n_devices)
    batch = 2 * n_devices
    rng = np.random.default_rng(0)
    ref_mask = rng.integers(1, 15, (batch, R_pad), dtype=np.uint8)
    qry_mask = rng.integers(1, 15, (batch, R_pad + B), dtype=np.uint8)
    rlen = np.full((batch,), R_pad // 2, dtype=np.int32)
    qlen = np.full((batch,), R_pad // 2 - 3, dtype=np.int32)
    ms = np.zeros((batch,), dtype=np.int32)
    W = np.full((batch,), (B - 2) // 2, dtype=np.int32)

    job_sharding = NamedSharding(mesh, P("jobs"))
    args = [
        jax.device_put(a, NamedSharding(mesh, P("jobs", *([None] * (a.ndim - 1)))))
        for a in (ref_mask, qry_mask, rlen, qlen, ms, W)
    ]

    fn = jax.jit(
        functools.partial(stripe_batch, R_pad=R_pad, B=B),
        in_shardings=[NamedSharding(mesh, P("jobs", *([None] * (a.ndim - 1)))) for a in args],
        out_shardings=NamedSharding(mesh, P("jobs")),
    )
    paths, h_last = fn(*args)
    paths.block_until_ready()
    assert paths.shape == (batch, R_pad, B)
    # sanity: every problem produced a nonzero traceback row
    assert bool((np.asarray(h_last) > -1_000_000).any())
