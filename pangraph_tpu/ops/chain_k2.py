"""K2: Pallas anchor-chaining DP kernel (SURVEY.md §7 P2).

Device form of minimap2's mm_chain_dp (minimap2-sys/minimap2/lchain.c; host
twins: align/chain.py numpy DP and native/chain.cpp):

    f[i] = max(k, max_{h < H} f[i-1-h] + min(dr, dq, k) - gap(|dr-dq|))

The recurrence is a sequential scan with a bounded look-back window. TPU
formulation: anchors are laid out column-major on (8, 128) int32 tiles
(flat index i = 8*lane + sublane), the grid walks 1024-anchor blocks, and
within a block the recurrence is iterated to its (unique) fixed point with
a `lax.while_loop` — each sweep propagates chains by one hop, fully
vectorized across the tile; convergence takes max-chain-hops-in-block
sweeps, not 1024. Window reads are flat shifts built from sublane+lane
rotates (`_shift_flat`; unaligned lane slices are avoided — Mosaic
miscompiles them, see ops/sketch_k1.py). The previous block's tail rides
along as a lane-concatenated carry scratch, and `parent` falls out of a
final argmax pass over the converged scores (ascending-h scan with strict
improvement = nearest-predecessor tie-break, exactly the host DPs').

The gap cost is the shared integer formulation (dd*k//100 + floor(log2 dd)/2,
log2 via a 10-compare ladder), bit-identical to both host implementations.

Routing decision (measured, dev/kernel_bench.py K2 section): like K1, the
kernel is latency/overhead-bound on the tunneled single chip and the native
C++ scan (~100 Manchors/s) keeps chaining <5% of build wall time, so
production chains on host; the kernel is the device path for co-resident
batched pipelines and is parity-locked by tests/test_chain_k2.py.
"""
from __future__ import annotations

import functools

import numpy as np

BLK = 1024  # anchors per grid block = one (8, 128) int32 tile
NEG = -(1 << 30)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def _shift_flat(x, d: int):
    """Flat column-major right-shift by static d on a (8, W) tile:
    out[i] = x[i - d] where i = 8*lane + sublane (wrap = caller-masked)."""
    import jax
    import jax.numpy as jnp

    if d == 0:
        return x
    ds, dl = d % 8, d // 8
    if ds:
        a = pltpu.roll(x, ds, 0)
        b = pltpu.roll(a, 1, 1)
        s_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        x = jnp.where(s_iota < ds, b, a)
    if dl:
        x = pltpu.roll(x, dl, 1)
    return x


def _ilog2(dd):
    """floor(log2(dd)) for 1 <= dd <= bw (<= 2^10): compare ladder, exact."""
    import jax.numpy as jnp

    out = jnp.zeros_like(dd)
    for t in range(1, 11):
        out = out + (dd >= (1 << t)).astype(dd.dtype)
    return out


def _chain_kernel(r_prev, q_prev, r_cur, q_cur, f_ref, par_ref, f_carry, *,
                  k: int, max_gap: int, bw: int, H: int):
    import jax
    import jax.numpy as jnp

    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        # no real previous block: carry holds pad scores (never valid
        # predecessors — the pad anchors' coordinates mask every candidate)
        f_carry[:] = jnp.full((8, 128), k, jnp.int32)

    r_ext = jnp.concatenate([r_prev[:], r_cur[:]], axis=1)  # (8, 256) flat 0..2047
    q_ext = jnp.concatenate([q_prev[:], q_cur[:]], axis=1)

    # per-window-offset contribution c_h[i] for the CURRENT block's anchors
    contribs = []
    r_c = r_ext[:, 128:]
    q_c = q_ext[:, 128:]
    for h in range(H):
        rs = _shift_flat(r_ext, h + 1)[:, 128:]
        qs = _shift_flat(q_ext, h + 1)[:, 128:]
        dr = r_c - rs
        dq = q_c - qs
        dd = jnp.abs(dr - dq)
        ok = (dr > 0) & (dq > 0) & (dr <= max_gap) & (dq <= max_gap) & (dd <= bw)
        alpha = jnp.minimum(jnp.minimum(dr, dq), k)
        gap = (dd * k) // 100 + (_ilog2(jnp.maximum(dd, 1)) >> 1)
        contribs.append(jnp.where(ok, alpha - gap, NEG))

    kv = jnp.full((8, 128), k, jnp.int32)

    def relax(f_cur):
        f_ext = jnp.concatenate([f_carry[:], f_cur], axis=1)
        best = jnp.full((8, 128), NEG, jnp.int32)
        for h in range(H):
            best = jnp.maximum(best, _shift_flat(f_ext, h + 1)[:, 128:] + contribs[h])
        return jnp.maximum(kv, best)

    def cond(state):
        f_cur, changed, it = state
        return changed & (it < BLK + 1)

    def body(state):
        f_cur, _, it = state
        f_new = relax(f_cur)
        return f_new, jnp.any(f_new != f_cur), it + 1

    f0 = relax(kv)
    f_fix, _, _ = jax.lax.while_loop(cond, body, (f0, jnp.bool_(True), jnp.int32(0)))

    # parent pass on the converged scores: ascending h, strict improvement
    # (= the host DP's nearest-on-tie rule); only candidates beating k count
    f_ext = jnp.concatenate([f_carry[:], f_fix], axis=1)
    best = kv
    besth = jnp.full((8, 128), -1, jnp.int32)
    for h in range(H):
        cand = _shift_flat(f_ext, h + 1)[:, 128:] + contribs[h]
        take = cand > best
        best = jnp.where(take, cand, best)
        besth = jnp.where(take, h, besth)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    flat = lane * 8 + sub
    gidx = j * BLK + flat
    par_ref[:] = jnp.where(besth >= 0, gidx - 1 - besth, -1)
    f_ref[:] = f_fix
    f_carry[:] = f_fix


@functools.lru_cache(maxsize=16)
def _chain_call(n_blocks: int, k: int, max_gap: int, bw: int, H: int):
    import jax
    import jax.numpy as jnp

    kernel = functools.partial(_chain_kernel, k=k, max_gap=max_gap, bw=bw, H=H)
    blk = lambda off: pl.BlockSpec(  # noqa: E731
        (8, 128), lambda j, _o=off: (0, j + _o), memory_space=pltpu.VMEM
    )
    out_blk = pl.BlockSpec((8, 128), lambda j: (0, j), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[blk(0), blk(0), blk(1), blk(1)],
        out_specs=[out_blk, out_blk],
        out_shape=[jax.ShapeDtypeStruct((8, n_blocks * 128), jnp.int32)] * 2,
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )
    return jax.jit(lambda rp, qp: call(rp, qp, rp, qp))


def chain_dp_pallas(r: np.ndarray, q: np.ndarray, k: int, max_gap: int, bw: int, H: int):
    """(f, parent) for anchors sorted by (r, q) — device K2. Bit-identical to
    align/chain.py's sequential DP / native chain_dp."""
    import jax

    n = len(r)
    if n == 0:
        return np.zeros(0, np.int64), np.full(0, -1, np.int64)
    n_blocks = (n + BLK - 1) // BLK
    # one leading pad block (never-valid predecessors) + trailing pad
    pad = np.full((n_blocks + 1) * BLK, -(1 << 40), np.int64)
    pad_q = pad.copy()
    pad[BLK : BLK + n] = r
    pad_q[BLK : BLK + n] = q
    # int32 coordinate space: offset so real coords are positive and pads are
    # very negative but in-range
    base = min(int(r.min()), int(q.min()))
    r32 = np.full((n_blocks + 1) * BLK, NEG, np.int32)
    q32 = np.full((n_blocks + 1) * BLK, NEG, np.int32)
    r32[BLK : BLK + n] = (r - base).astype(np.int32)
    q32[BLK : BLK + n] = (q - base).astype(np.int32)
    if (r - base).max() >= (1 << 30) or (q - base).max() >= (1 << 30):
        raise ValueError("anchor coordinates exceed the kernel's int32 range")
    # column-major tiles: flat i = 8*lane + sublane
    rt = r32.reshape(n_blocks + 1, 128, 8).transpose(0, 2, 1).reshape(n_blocks + 1, 8, 128)
    qt = q32.reshape(n_blocks + 1, 128, 8).transpose(0, 2, 1).reshape(n_blocks + 1, 8, 128)
    rt = np.concatenate(rt, axis=1)  # (8, (n_blocks+1)*128)
    qt = np.concatenate(qt, axis=1)
    run = _chain_call(n_blocks, k, max_gap, bw, H)
    f_t, p_t = jax.device_get(run(rt, qt))
    # back to flat order
    f = np.stack(np.split(f_t, n_blocks, axis=1)).transpose(0, 2, 1).reshape(-1)
    par = np.stack(np.split(p_t, n_blocks, axis=1)).transpose(0, 2, 1).reshape(-1)
    return f[:n].astype(np.int64), par[:n].astype(np.int64)
