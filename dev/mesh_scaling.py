#!/usr/bin/env python
"""Multichip scaling evidence for the sharded alignment round (VERDICT r4 #4).

Two legs, both over the same shard_map/'jobs'-mesh structure that
TpuBatchAligner._sharded_align builds, at mesh sizes n in {1, 2, 4, 8} on
the virtual CPU mesh with a FIXED TOTAL batch (strong scaling):

1. STRUCTURAL leg (Pallas stripe kernel, interpret mode on CPU): the
   compiled HLO module must contain no cross-device collectives
   (all-reduce / all-gather / collective-permute / all-to-all) — the job
   axis is embarrassingly parallel end to end, including the packed D2H
   gather. Interpret-mode walls are NOT reported as a scaling curve
   (VERDICT r4: super-linear interpret-mode "efficiency" is a measurement
   artifact); the zero-collectives assertion is the claim.
2. COMPILED leg: an XLA:CPU-compiled scan-based banded-DP twin (same row
   recurrence structure and band memory pattern as the stripe kernel; no
   TPU-only primitives) under the identical shard_map. Its walls are real
   compiled-code timings; efficiency is reported against the honest ideal
   min(n, host_cores) — a 2-core box cannot express an 8-device speedup.

Each mesh size runs in a subprocess because the XLA device count is fixed
at backend init.

Usage: python dev/mesh_scaling.py [--json SCALING_r05.json]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

M, R_CAP, B, L, K, G_SZ = 64, 2048, 128, 2000, 256, 8


def _compiled_band_dp(n: int, shard_map, P, mesh):
    """COMPILED leg: scan-based banded-DP twin of the stripe kernel — the
    same per-row structure (query-byte gather along the band, affine-gap
    3-way max, in-band masking) expressed in jnp so XLA:CPU compiles real
    vector code. Score-only (no traceback): the DP recurrence is the
    scaling-relevant compute; walls here are honest compiled-mode timings."""
    import functools

    import numpy as np

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    ref = np.zeros((M, L), np.uint8)
    qry = np.zeros((M, L + B), np.uint8)
    for s in range(M):
        r = ACGT[rng.integers(0, 4, L)]
        q = r.copy()
        idx = rng.choice(L, L // 50, replace=False)
        q[idx] = ACGT[rng.integers(0, 4, len(idx))]
        ref[s, :] = r
        qry[s, : L] = q
    qlen = np.full(M, L, np.int32)

    NEG = jnp.int32(-(1 << 20))
    offs = jnp.arange(B, dtype=jnp.int32) - B // 2

    def one_job(ref_row, qry_row, qn):
        def row_step(carry, i):
            H, E = carry
            qpos = i + offs
            qb = qry_row[jnp.clip(qpos, 0, L + B - 1)]
            sub = jnp.where(qb == ref_row[i], jnp.int32(3), jnp.int32(-3))
            in_band = (qpos >= 0) & (qpos < qn)
            diag = H + sub
            E = jnp.maximum(E - 1, H - 5)
            left = jnp.maximum(jnp.roll(H, 1).at[0].set(NEG) - 5, E)
            Hn = jnp.where(in_band, jnp.maximum(diag, left), NEG)
            return (Hn, E), Hn.max()

        H0 = jnp.where(offs == 0, jnp.int32(0), NEG)
        (_, _), best = jax.lax.scan(row_step, (H0, jnp.full((B,), NEG)), jnp.arange(L))
        return best.max()

    kernel = jax.vmap(one_job)
    jobs_p = P("jobs")
    fn = jax.jit(
        shard_map(
            kernel, mesh=mesh, in_specs=(jobs_p,) * 3, out_specs=jobs_p, check_rep=False
        )
    )
    args = (jnp.asarray(ref), jnp.asarray(qry), jnp.asarray(qlen))
    lowered = fn.lower(*args)
    hlo = lowered.compile().as_text()
    collectives = sorted(
        {w for w in ("all-reduce", "all-gather", "collective-permute", "all-to-all") if w in hlo}
    )
    np.asarray(fn(*args))  # warm
    walls = []
    for _ in range(5):
        t = time.time()
        got = np.asarray(fn(*args))
        walls.append(time.time() - t)
    assert np.isfinite(got).all()
    return {"wall_s": round(min(walls), 4), "collectives_in_hlo": collectives,
            "cells": M * L * B}


def child(n: int) -> None:
    import functools

    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax import shard_map as _sm
        import inspect

        _rep_kw = "check_rep" if "check_rep" in inspect.signature(_sm).parameters else "check_vma"

        def shard_map(f, **kw):
            rep = kw.pop("check_rep", None)
            if rep is not None:
                kw[_rep_kw] = rep
            return _sm(f, **kw)
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from pangraph_tpu.ops.stripe_v2 import stripe_align_v2
    from pangraph_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n)
    rng = np.random.default_rng(0)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    ref_seq = np.zeros((M, R_CAP), np.uint8)
    qry_seq = np.zeros((M, R_CAP + B), np.uint8)
    for s in range(M):
        r = ACGT[rng.integers(0, 4, L)]
        q = r.copy()
        idx = rng.choice(L, L // 50, replace=False)
        q[idx] = ACGT[rng.integers(0, 4, len(idx))]
        q = np.concatenate([q[: L // 2], q[L // 2 + 4 :]])  # a deletion: forces >=1 indel event
        ref_seq[s, :L] = r
        qry_seq[s, : len(q)] = q
    rlen = np.full(M, L, np.int32)
    qlen = np.full(M, L - 4, np.int32)
    ms = np.zeros(M, np.int32)
    W = np.full(M, (B - 2) // 2, np.int32)
    gmax = rlen.reshape(-1, G_SZ).max(axis=1).astype(np.int32)
    args = (ref_seq, qry_seq, rlen, qlen, ms, W, gmax)

    kernel = functools.partial(stripe_align_v2, R_cap=R_CAP, B=B, K=K, g_size=G_SZ)
    jobs_p = P("jobs")
    fn = jax.jit(
        shard_map(
            kernel,
            mesh=mesh,
            in_specs=(jobs_p,) * 7,
            out_specs={"rows": jobs_p, "words": jobs_p, "n_events": jobs_p, "meta": jobs_p},
            check_rep=False,
        )
    )
    lowered = fn.lower(*args)
    hlo = lowered.compile().as_text()
    collectives = sorted(
        {w for w in ("all-reduce", "all-gather", "collective-permute", "all-to-all") if w in hlo}
    )
    # warm
    out = fn(*args)
    np.asarray(out["n_events"])
    walls = []
    for _ in range(5):
        t = time.time()
        out = fn(*args)
        # the gather: every result buffer crosses D2H, as in production
        got = {k: np.asarray(v) for k, v in out.items()}
        walls.append(time.time() - t)
    # every job carries one deletion: the walk must emit >= M indel events
    assert int(got["n_events"].sum()) >= M, got["n_events"]
    compiled = _compiled_band_dp(n, shard_map, P, mesh)
    print(
        json.dumps(
            {
                "n_devices": n,
                "jobs_per_device": M // n,
                "pallas_interpret": {
                    "wall_s": round(min(walls), 4),
                    "collectives_in_hlo": collectives,
                    "cells": M * L * B,
                },
                "compiled_dp": compiled,
            }
        )
    )


def main() -> int:
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
        return 0
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    rows = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + (":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            env=env, capture_output=True, text=True, timeout=900,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"n={n} FAILED:\n{r.stdout}\n{r.stderr[-2000:]}", file=sys.stderr)
            return 1
        row = json.loads(line[-1])
        rows.append(row)
        print(row)
    t1 = rows[0]["compiled_dp"]["wall_s"]
    cores = os.cpu_count() or 1
    for row in rows:
        n = row["n_devices"]
        c = row["compiled_dp"]
        # efficiency is reported for the COMPILED leg only, against the
        # honest ideal min(n, cores): a 2-core box cannot express an
        # 8-device speedup, and interpret-mode walls are not a scaling
        # curve at all (VERDICT r4 — the super-linear interpret-mode
        # efficiency column was a measurement artifact and is gone)
        c["speedup_vs_n1"] = round(t1 / c["wall_s"], 3)
        c["efficiency_vs_core_limit"] = round(t1 / (min(n, cores) * c["wall_s"]), 3)
    report = {
        "workload": f"fixed total batch: {M} jobs x L={L} B={B} (strong scaling), "
        "shard_map over a 'jobs' mesh",
        "host_cores": cores,
        "legs": {
            "pallas_interpret": "structural evidence only: zero cross-device collectives "
            "in the compiled HLO of the production sharded Pallas kernel (walls are "
            "interpret-mode and carry no scaling information)",
            "compiled_dp": "XLA:CPU-compiled scan-based banded-DP twin under the identical "
            "shard_map; walls are real compiled-code timings, efficiency vs min(n, cores)",
        },
        "rows": rows,
    }
    print(json.dumps(report))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_json}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
