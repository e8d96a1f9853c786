"""K1: Pallas minimizer-sketch kernel (SURVEY.md §7 P2).

Replaces the sketching phase of the reference's minimizer index
(minimap2-sys/minimap2/index.c k-mer sketch; distance/mash/minimizer.rs:49-130
with the Jenkins invertible hash, hash.rs:3) on device: batched, fully
data-parallel — k shift-OR ops build both strands' k-mer codes, the Jenkins
mix runs in emulated 64-bit (hi, lo uint32 pairs: TPU has no native i64),
and the windowed minimum is an offset-doubling argmin reduction, all on
(g, lane) tiles in VMEM.

Layout: the sequence is chunked along lanes; each grid step (i, j) reads its
own chunk AND the next chunk (two BlockSpec views of the same input) so the
(w - 1) + (k - 1) halo is available as static in-block slices — no dynamic
DMA, no scalar loops. Outputs are dense per-window (min_hi, min_lo,
pos<<1|strand); the host compacts exactly as sketch_numpy does.

Parity: bit-exact with align/minimizer.py::sketch_numpy (the reference
implementation) — tests/test_sketch_k1.py.
"""
from __future__ import annotations

import functools

import numpy as np

from pangraph_tpu.align.minimizer import Minimizers
from pangraph_tpu.graph.seq import TWOBIT, as_seq

C = 512  # window-start columns produced per grid step (multiple of 128)
GS = 8  # sublane rows per block (int32 min tile)

# ---------------------------------------------------------------- u64 emulation
# 64-bit values are (hi, lo) pairs of uint32 arrays. Shift amounts are static
# Python ints, so every helper unrolls to a handful of VPU ops.


def _u64_shl(hi, lo, s: int):
    import jax.numpy as jnp

    if s == 0:
        return hi, lo
    if s >= 32:
        return (lo << (s - 32)) if s > 32 else lo, jnp.zeros_like(lo)
    return (hi << s) | (lo >> (32 - s)), lo << s


def _u64_shr(hi, lo, s: int):
    import jax.numpy as jnp

    if s == 0:
        return hi, lo
    if s >= 32:
        return jnp.zeros_like(hi), (hi >> (s - 32)) if s > 32 else hi
    return hi >> s, (lo >> s) | (hi << (32 - s))


def _u64_add(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = (lo < alo).astype(lo.dtype)
    return ahi + bhi + carry, lo


def _u64_xor(ahi, alo, bhi, blo):
    return ahi ^ bhi, alo ^ blo


def _u64_lt(ahi, alo, bhi, blo):
    """Unsigned 64-bit a < b."""
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def _jenkins_u64(hi, lo, mask_hi: int, mask_lo: int):
    """Jenkins invertible mix under a 2k-bit mask (hash.rs:3-12), unrolled on
    (hi, lo) uint32 pairs."""
    import jax.numpy as jnp

    mh = jnp.uint32(mask_hi)
    ml = jnp.uint32(mask_lo)

    def m(h, l):
        return h & mh, l & ml

    # x = (~x + (x << 21)) & mask
    sh, sl = _u64_shl(hi, lo, 21)
    hi, lo = m(*_u64_add(~hi, ~lo, sh, sl))
    # x ^= x >> 24
    hi, lo = _u64_xor(hi, lo, *_u64_shr(hi, lo, 24))
    # x = (x + (x << 3) + (x << 8)) & mask
    h3, l3 = _u64_shl(hi, lo, 3)
    h8, l8 = _u64_shl(hi, lo, 8)
    hi, lo = _u64_add(hi, lo, h3, l3)
    hi, lo = m(*_u64_add(hi, lo, h8, l8))
    # x ^= x >> 14
    hi, lo = _u64_xor(hi, lo, *_u64_shr(hi, lo, 14))
    # x = (x + (x << 2) + (x << 4)) & mask
    h2, l2 = _u64_shl(hi, lo, 2)
    h4, l4 = _u64_shl(hi, lo, 4)
    hi, lo = _u64_add(hi, lo, h2, l2)
    hi, lo = m(*_u64_add(hi, lo, h4, l4))
    # x ^= x >> 28
    hi, lo = _u64_xor(hi, lo, *_u64_shr(hi, lo, 28))
    # x = (x + (x << 31)) & mask
    hi, lo = m(*_u64_add(hi, lo, *_u64_shl(hi, lo, 31)))
    return hi, lo


# ---------------------------------------------------------------------- kernel


def _sketch_kernel(code_ref, next_ref, hi_ref, lo_ref, ps_ref, *, k: int, w: int, width: int):
    """One grid step: window starts [jC, jC + C) of every row in the block.

    width = C + Wpad + (k - 1) is the number of k-mer positions needed (the
    last window starts at column C - 1 and spans w positions; Wpad >= w - 1).
    """
    import jax
    import jax.numpy as jnp

    ext = jnp.concatenate([code_ref[:], next_ref[:]], axis=1)  # (GS, 2C) uint32
    valid = ext < jnp.uint32(4)
    bb = jnp.where(valid, ext, jnp.uint32(0))

    # k-mer codes at positions [0, width): k static shifted ORs per strand
    fh = jnp.zeros((GS, width), jnp.uint32)
    fl = jnp.zeros((GS, width), jnp.uint32)
    rh = jnp.zeros((GS, width), jnp.uint32)
    rl = jnp.zeros((GS, width), jnp.uint32)
    ok = jnp.ones((GS, width), bool)
    for j in range(k):
        b = bb[:, j : j + width]
        ok = ok & valid[:, j : j + width]
        fs = 2 * (k - 1 - j)
        if fs >= 32:
            fh = fh | (b << (fs - 32))
        else:
            fl = fl | (b << fs)
        c = jnp.uint32(3) ^ b
        rs = 2 * j
        if rs >= 32:
            rh = rh | (c << (rs - 32))
        else:
            rl = rl | (c << rs)

    is_rev = _u64_lt(rh, rl, fh, fl)
    ambiguous = (rh == fh) & (rl == fl)
    ch = jnp.where(is_rev, rh, fh)
    cl = jnp.where(is_rev, rl, fl)
    mask = (1 << (2 * k)) - 1
    hh, hl = _jenkins_u64(ch, cl, (mask >> 32) & 0xFFFFFFFF, mask & 0xFFFFFFFF)
    sent = jnp.uint32(0xFFFFFFFF)
    good = ok & ~ambiguous
    hh = jnp.where(good, hh, sent)
    hl = jnp.where(good, hl, sent)

    # absolute position + strand, carried through the argmin reduction
    j0 = pl.program_id(1) * C
    pos = (
        jax.lax.broadcasted_iota(jnp.uint32, (GS, width), 1)
        + jnp.uint32(j0)
    )
    ps = (pos << 1) | is_rev.astype(jnp.uint32)

    # windowed min over w, leftmost tie: offset doubling (strict less keeps
    # the left candidate on ties, as sliding_argmin does)
    vh, vl, vp = hh, hl, ps
    n = width
    span = 1
    while span < w:
        step = min(span, w - span)
        m = n - step
        take = _u64_lt(vh[:, step : step + m], vl[:, step : step + m], vh[:, :m], vl[:, :m])
        vh = jnp.where(take, vh[:, step : step + m], vh[:, :m])
        vl = jnp.where(take, vl[:, step : step + m], vl[:, :m])
        vp = jnp.where(take, vp[:, step : step + m], vp[:, :m])
        n = m
        span += step

    hi_ref[:] = vh[:, :C].astype(jnp.int32)
    lo_ref[:] = vl[:, :C].astype(jnp.int32)
    ps_ref[:] = vp[:, :C].astype(jnp.int32)


try:  # pl is needed at module level by the kernel body (program_id)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover - jax is a hard dep in practice
    pl = None
    pltpu = None


@functools.lru_cache(maxsize=32)
def _sketch_call(k: int, w: int, n_chunks: int, m_pad: int):
    import jax
    import jax.numpy as jnp

    Wpad = ((w - 1 + (k - 1) + 127) // 128) * 128
    width = C + Wpad
    if width + k - 1 > 2 * C:
        raise ValueError(f"w={w}, k={k} halo exceeds one chunk (C={C})")

    kernel = functools.partial(_sketch_kernel, k=k, w=w, width=width)
    grid = (m_pad // GS, n_chunks)
    # the input has n_chunks + 1 blocks, so the j+1 halo view always exists
    blk = lambda off: pl.BlockSpec(  # noqa: E731
        (GS, C), lambda i, j, _off=off: (i, j + _off), memory_space=pltpu.VMEM
    )
    out_blk = pl.BlockSpec((GS, C), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk(0), blk(1)],
        out_specs=[out_blk, out_blk, out_blk],
        out_shape=[jax.ShapeDtypeStruct((m_pad, n_chunks * C), jnp.int32)] * 3,
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def run(codes):
        return call(codes, codes)

    return run


def sketch_pallas_batch(codes: np.ndarray, k: int, w: int):
    """Dense device sketch of a (m, L_pad) uint32 code batch (TWOBIT codes,
    >=4 = invalid). Returns (min_hi, min_lo, pos<<1|strand) int32 arrays of
    shape (m, n_chunks*C) covering window starts [0, L_pad - C)."""
    import jax

    m, L_pad = codes.shape
    assert L_pad % C == 0 and L_pad >= 2 * C
    m_pad = ((m + GS - 1) // GS) * GS
    if m_pad != m:
        codes = np.pad(codes, ((0, m_pad - m), (0, 0)), constant_values=4)
    run = _sketch_call(k, w, L_pad // C - 1, m_pad)
    hi, lo, ps = jax.device_get(run(codes))
    return hi[:m], lo[:m], ps[:m]


SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def sketch_pallas(seq: np.ndarray, k: int, w: int) -> Minimizers:
    """Device minimizer sketch of one sequence; bit-exact vs sketch_numpy."""
    seq = as_seq(seq)
    n = len(seq) - k + 1  # k-mer positions
    n_w = n - w + 1  # windows
    if n <= 0 or n_w <= 0:
        return Minimizers(
            np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint8)
        )
    codes = TWOBIT[seq].astype(np.uint32)
    # pad so every chunk's +1 neighbour exists and covers the full halo
    L_pad = ((n_w + C - 1) // C + 1) * C
    pad = np.full(L_pad, 4, dtype=np.uint32)
    pad[: len(codes)] = codes
    hi, lo, ps = sketch_pallas_batch(pad[None, :], k, w)
    vals = (hi[0].astype(np.uint64) & 0xFFFFFFFF) << np.uint64(32) | (
        lo[0].astype(np.uint64) & 0xFFFFFFFF
    )
    vals = vals[:n_w]
    ps = ps[0, :n_w].astype(np.uint32)
    pos = (ps >> 1).astype(np.int64)
    strand = (ps & 1).astype(np.uint8)
    keep = vals != SENTINEL
    first = np.concatenate(([True], np.diff(pos) != 0))
    keep &= first
    return Minimizers(values=vals[keep], positions=pos[keep], strands=strand[keep])
