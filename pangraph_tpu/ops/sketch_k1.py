"""K1: Pallas minimizer-sketch kernel (SURVEY.md §7 P2).

Replaces the sketching phase of the reference's minimizer index
(minimap2-sys/minimap2/index.c k-mer sketch; distance/mash/minimizer.rs:49-130
with the Jenkins invertible hash, hash.rs:3) on device: batched, fully
data-parallel — k shift-OR ops build both strands' k-mer codes, the Jenkins
mix runs in emulated 64-bit, and the windowed minimum is an offset-doubling
argmin reduction, all on (g, lane) tiles in VMEM.

64-bit emulation uses (hi, lo) pairs of **int32** words: Mosaic's unsigned
lowering is unreliable (u32 compares/shifts produced wrong bits on v5e while
the identical ops were correct under XLA jit and Pallas interpret), so
logical right shift is arithmetic-shift + mask and unsigned compare is a
sign-bias flip — all in well-supported signed int32.

Layout: the sequence is chunked along lanes; each grid step (i, j) reads its
own chunk AND the next chunk (two BlockSpec views of the same input) so the
(w - 1) + (k - 1) halo is available as static in-block slices — no dynamic
DMA, no scalar loops. Outputs are dense per-window (min_hi, min_lo,
pos<<1|strand); the host compacts exactly as sketch_numpy does.

Parity: bit-exact with align/minimizer.py::sketch_numpy (the reference
implementation) — tests/test_sketch_k1.py, and on-device parity is asserted
in dev/kernel_bench.py's K1 section.

Routing decision (measured r3 on the tunneled v5e, warm shapes): the device
kernel runs at 0.4-0.5 Mbp/s vs the native C++ rolling sketch's 40-55 Mbp/s
(native/sketch.cpp) — the (8, lane) single-sequence geometry leaves the
kernel grid-overhead-bound and the dense 12 B/bp result crosses the tunnel.
Sketching is also only ~0.3% of build wall time. The production sketch
therefore stays on host (align/minimizer.py::sketch -> native); this kernel
is the device path for deployments that want sketching co-resident with
batched device alignment (call sketch_pallas_batch with m >= 8 sequences to
fill the sublanes).
"""
from __future__ import annotations

import functools

import numpy as np

from pangraph_tpu.align.minimizer import Minimizers
from pangraph_tpu.graph.seq import TWOBIT, as_seq

C = 512  # window-start columns produced per grid step (multiple of 128)
GS = 8  # sublane rows per block (int32 min tile)

_BIAS = -(1 << 31)  # int32 sign bit, for unsigned-order compares


def _i32(v: int):
    """Python int (possibly >= 2^31) -> equivalent int32 bit pattern."""
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


# ------------------------------------------------------------- i32 bit helpers


def _lsr(x, s: int):
    """Logical right shift on int32 (arithmetic shift + high-bit mask)."""
    import jax.numpy as jnp

    if s == 0:
        return x
    return (x >> s) & jnp.int32((1 << (32 - s)) - 1)


def _ult(a, b):
    """Unsigned a < b on int32 words (sign-bias flip)."""
    import jax.numpy as jnp

    bias = jnp.int32(_BIAS)
    return (a ^ bias) < (b ^ bias)


# ----------------------------------------------------- u64 emulation (hi, lo)


def _u64_shl(hi, lo, s: int):
    import jax.numpy as jnp

    if s == 0:
        return hi, lo
    if s >= 32:
        return (lo << (s - 32)) if s > 32 else lo, jnp.zeros_like(lo)
    return (hi << s) | _lsr(lo, 32 - s), lo << s


def _u64_shr(hi, lo, s: int):
    import jax.numpy as jnp

    if s == 0:
        return hi, lo
    if s >= 32:
        return jnp.zeros_like(hi), (_lsr(hi, s - 32) if s > 32 else hi)
    return _lsr(hi, s), _lsr(lo, s) | (hi << (32 - s))


def _u64_add(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = _ult(lo, alo).astype(lo.dtype)
    return ahi + bhi + carry, lo


def _u64_xor(ahi, alo, bhi, blo):
    return ahi ^ bhi, alo ^ blo


def _u64_lt(ahi, alo, bhi, blo):
    """Unsigned 64-bit a < b."""
    return _ult(ahi, bhi) | ((ahi == bhi) & _ult(alo, blo))


def _jenkins_u64(hi, lo, mask_hi: int, mask_lo: int):
    """Jenkins invertible mix under a 2k-bit mask (hash.rs:3-12), unrolled on
    (hi, lo) int32 pairs."""
    import jax.numpy as jnp

    mh = jnp.int32(_i32(mask_hi))
    ml = jnp.int32(_i32(mask_lo))

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

    width = C + Wpad is the number of k-mer positions needed (the last window
    starts at column C - 1 and spans w positions; Wpad >= w - 1).
    """
    import jax
    import jax.numpy as jnp

    ext = jnp.concatenate([code_ref[:], next_ref[:]], axis=1)  # (GS, 2C) int32
    W2 = 2 * C
    vmask = (ext < jnp.int32(4)).astype(jnp.int32)
    bb = jnp.where(vmask > 0, ext, jnp.int32(0))

    # k-mer codes at positions [0, width): k shifted ORs per strand. Shifted
    # views come from pltpu.roll (lane rotate), NOT unaligned lane slices —
    # Mosaic miscompiles `x[:, j:j+width] << s` at some offsets (observed on
    # v5e: dropped bits; the roll formulation is bit-exact).
    fh = jnp.zeros((GS, width), jnp.int32)
    fl = jnp.zeros((GS, width), jnp.int32)
    rh = jnp.zeros((GS, width), jnp.int32)
    rl = jnp.zeros((GS, width), jnp.int32)
    ok = jnp.ones((GS, width), jnp.int32)
    for j in range(k):
        b = pltpu.roll(bb, (W2 - j) % W2, 1)[:, :width]
        ok = ok & pltpu.roll(vmask, (W2 - j) % W2, 1)[:, :width]
        fs = 2 * (k - 1 - j)
        if fs >= 32:
            fh = fh | (b << (fs - 32))
        else:
            fl = fl | (b << fs)
        c = jnp.int32(3) ^ b
        rs = 2 * j
        if rs >= 32:
            rh = rh | (c << (rs - 32))
        else:
            rl = rl | (c << rs)
    ok = ok > 0

    is_rev = _u64_lt(rh, rl, fh, fl)
    ambiguous = (rh == fh) & (rl == fl)
    ch = jnp.where(is_rev, rh, fh)
    cl = jnp.where(is_rev, rl, fl)
    mask = (1 << (2 * k)) - 1
    hh, hl = _jenkins_u64(ch, cl, (mask >> 32) & 0xFFFFFFFF, mask & 0xFFFFFFFF)
    sent = jnp.int32(-1)  # 0xFFFFFFFF
    good = ok & ~ambiguous
    hh = jnp.where(good, hh, sent)
    hl = jnp.where(good, hl, sent)

    # absolute position + strand, carried through the argmin reduction
    j0 = pl.program_id(1) * C
    pos = jax.lax.broadcasted_iota(jnp.int32, (GS, width), 1) + j0
    ps = (pos << 1) | is_rev.astype(jnp.int32)

    # windowed min over w, leftmost tie: offset doubling (strict less keeps
    # the left candidate on ties, as sliding_argmin does). Arrays stay full
    # width; shifted reads are lane rotates. A column i's value after
    # accumulating span s is valid iff i + s <= width, and the final outputs
    # are columns [0, C) with span w where C + w - 1 <= width by
    # construction — wrapped-lane garbage never reaches them.
    vh, vl, vp = hh, hl, ps
    span = 1
    while span < w:
        step = min(span, w - span)
        r = (width - step) % width
        sh = pltpu.roll(vh, r, 1)
        sl = pltpu.roll(vl, r, 1)
        sp = pltpu.roll(vp, r, 1)
        take = _u64_lt(sh, sl, vh, vl)
        vh = jnp.where(take, sh, vh)
        vl = jnp.where(take, sl, vl)
        vp = jnp.where(take, sp, vp)
        span += step

    hi_ref[:] = vh[:, :C]
    lo_ref[:] = vl[:, :C]
    ps_ref[:] = vp[:, :C]


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
    """Dense device sketch of a (m, L_pad) int32 code batch (TWOBIT codes,
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
    codes = TWOBIT[seq].astype(np.int32)
    # pad so every chunk's +1 neighbour exists and covers the full halo
    L_pad = ((n_w + C - 1) // C + 1) * C
    pad = np.full(L_pad, 4, dtype=np.int32)
    pad[: len(codes)] = codes
    hi, lo, ps = sketch_pallas_batch(pad[None, :], k, w)
    vals = (hi[0].astype(np.int64).astype(np.uint64) & np.uint64(0xFFFFFFFF)) << np.uint64(32) | (
        lo[0].astype(np.int64).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    )
    vals = vals[:n_w]
    ps_u = ps[0, :n_w].view(np.uint32)
    pos = (ps_u >> 1).astype(np.int64)
    strand = (ps_u & 1).astype(np.uint8)
    keep = vals != SENTINEL
    first = np.concatenate(([True], np.diff(pos) != 0))
    keep &= first
    return Minimizers(values=vals[keep], positions=pos[keep], strands=strand[keep])
