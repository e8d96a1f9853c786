"""Batched banded affine-gap DP for TPU (K3 of SURVEY.md §7).

Same score model and traceback-bit semantics as `pangraph_tpu.align.stripe`
(which mirrors the reference score_matrix.rs/backtrace.rs), re-shaped for the
device:

- **uniform band**: every row covers exactly B contiguous query columns
  [lo_i, lo_i + B); lo_i = clip(i - ms - W, 0, qlen + 1 - B) is 1-Lipschitz so
  the carry realigns by a 0/1 roll per row — no ragged stripes. The upper clip
  drags the band onto the end corner, playing the role of the reference's
  forced last-stripe widening (band_2d.rs:50-52); restricted cells carry
  BOUNDARY bits so the caller retries with a doubled band exactly like
  align/align.rs:55-63.
- **in-row gap chain as associative scan**: with gap-extend 0 the ref-gap
  recurrence collapses to G = cummax(H_prev_cell - open) along the band
  (derivation in align/stripe.py), a log-depth VPU reduction.
- **lax.scan over rows, vmap over problems**: one compiled kernel per
  (R_pad, B) bucket; all per-node re-alignments of a merge round run in one
  device call. Traceback bits stream to HBM as int8 [R_pad, B]; the sequential
  backtrace runs on host (C++ fast path in native/, numpy fallback).

Score parameters are fixed to the pangraph set (match 3 / mismatch 1 / gap
open 6 / extend 0, free terminal gaps — params.rs:142-158).

Inputs are IUPAC bitmasks (uint8): match iff masks intersect; mask 15 ('N')
scores as a near-match (score_matrix.rs:118-126).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MATCH = 1
REF_GAP_MATRIX = 2
QRY_GAP_MATRIX = 4
REF_GAP_EXTEND = 8
QRY_GAP_EXTEND = 16
BOUNDARY = 32

NO_ALIGN = jnp.int32(-1_000_000_000)

SCORE_MATCH = 3
PENALTY_MISMATCH = 1
GAP_OPEN = 6


def band_lo(i, ms, W, qlen, B):
    """Band start column for row i (same formula on host and device)."""
    return jnp.clip(i - ms - W, 0, jnp.maximum(qlen + 1 - B, 0))


def _row_step(carry, i, *, B, ref_mask, qry_mask_padded, rlen, qlen, ms, W):
    """One DP row in band coordinates.

    carry = (H_prev [B], qgap [B], lo_prev, pprev_hi) where pprev_hi is the
    end column of the stripe two rows above (for the gap-extension allowance,
    score_matrix.rs:176)."""
    H_prev, qgap, lo_prev, pprev_hi = carry

    lo = band_lo(i, ms, W, qlen, B)
    shift = lo - lo_prev  # 0 or 1

    k = jnp.arange(B, dtype=jnp.int32)
    qpos = lo + k
    in_matrix = (qpos <= qlen) & (i <= rlen)
    edge_hi = k == B - 1
    edge_lo = k == 0

    # --- realign previous-row carries: prev band covers [lo_prev, lo_prev+B)
    # diag cell (i-1, qpos-1) -> prev index k + shift - 1
    H_diag = jnp.where(shift == 1, H_prev, jnp.roll(H_prev, 1))
    H_diag = jnp.where((shift == 0) & edge_lo, NO_ALIGN, H_diag)
    diag_valid = (qpos - 1 >= lo_prev) & (qpos - 1 < lo_prev + B) & (qpos >= 1) & in_matrix
    # up cell (i-1, qpos) -> prev index k + shift
    H_up = jnp.where(shift == 0, H_prev, jnp.roll(H_prev, -1))
    qgap_up = jnp.where(shift == 0, qgap, jnp.roll(qgap, -1))
    H_up = jnp.where((shift == 1) & edge_hi, NO_ALIGN, H_up)
    qgap_up = jnp.where((shift == 1) & edge_hi, NO_ALIGN, qgap_up)
    up_valid = (qpos < lo_prev + B) & (qpos >= 1) & in_matrix

    # --- match move
    rm = ref_mask[jnp.maximum(i - 1, 0)].astype(jnp.int32)
    qm = jnp.take(qry_mask_padded, qpos, mode="clip").astype(jnp.int32)  # = qry_mask[qpos-1]
    unknown = (rm == 15) | (qm == 15)
    compat = (rm & qm) > 0
    msub = jnp.where(unknown, SCORE_MATCH - 1, jnp.where(compat, SCORE_MATCH, -PENALTY_MISMATCH))
    M = jnp.where(diag_valid, H_diag + msub, NO_ALIGN)
    interior = (qpos >= 1) & (i < rlen) & (qpos < qlen) & in_matrix
    path = jnp.where(~diag_valid & interior, BOUNDARY, 0).astype(jnp.int32)

    # --- qry gap (vertical); free trailing deletion at qpos == qlen
    q_free = qpos == qlen
    q_ext_val = qgap_up
    q_open_val = jnp.where(q_free, H_up, H_up - GAP_OPEN)
    q_ext_allowed = (q_ext_val >= q_open_val) & (qpos < pprev_hi)
    QG = jnp.where(up_valid, jnp.where(q_ext_allowed, q_ext_val, q_open_val), NO_ALIGN)
    path = path | jnp.where(up_valid & q_ext_allowed, QRY_GAP_EXTEND, 0)
    path = path | jnp.where(~up_valid & interior, BOUNDARY, 0)
    new_qgap = jnp.where(up_valid, QG, NO_ALIGN)

    # --- first matrix column: free leading deletion; participates in the chain
    first_col = (qpos == 0) & in_matrix
    M = jnp.where(first_col, 0, M)

    NQ = jnp.maximum(M, QG)

    # --- ref gap (horizontal) via prefix max; free trailing insertion at i == rlen
    gap_cost = jnp.where(i == rlen, 0, GAP_OPEN)
    seed = jnp.concatenate([jnp.full((1,), NO_ALIGN), NQ[:-1] - gap_cost])
    G = jax.lax.associative_scan(jnp.maximum, seed)
    G = jnp.where(edge_lo, NO_ALIGN, G)
    path = path | jnp.where(edge_lo & interior, BOUNDARY, 0)
    prevG = jnp.concatenate([jnp.full((1,), NO_ALIGN), G[:-1]])
    Hm1 = jnp.maximum(NQ, G)
    r_open_prev = jnp.concatenate([jnp.full((1,), NO_ALIGN), Hm1[:-1] - gap_cost])
    r_ext = (prevG >= r_open_prev) & (k > 1)
    path = path | jnp.where((G > NO_ALIGN) & r_ext, REF_GAP_EXTEND, 0)

    # --- combine with reference tie order (qry gap > ref gap > match)
    best_mr = jnp.where(G >= M, G, M)
    origin_mr = jnp.where(G >= M, REF_GAP_MATRIX, MATCH)
    H = jnp.where(QG >= best_mr, QG, best_mr)
    origin = jnp.where(QG >= best_mr, QRY_GAP_MATRIX, origin_mr)

    H = jnp.where(first_col, 0, H)
    origin = jnp.where(first_col, QRY_GAP_MATRIX, origin)
    path = jnp.where(first_col, QRY_GAP_EXTEND, path)
    path = path | origin
    H = jnp.where(in_matrix, H, NO_ALIGN)
    path = jnp.where(in_matrix, path, 0)

    # rows beyond the real matrix keep the carry frozen
    live = i <= rlen
    H_out = jnp.where(live, H, H_prev)
    qgap_out = jnp.where(live, new_qgap, qgap)
    lo_out = jnp.where(live, lo, lo_prev)
    pprev_out = jnp.where(live, lo_prev + B, pprev_hi)

    return (H_out, qgap_out, lo_out, pprev_out), path.astype(jnp.int8)


# --------------------------------------------------------------------------- #
#  Chunked kernel: fixed (C, B) shapes -> one compilation per band width.     #
#  The row dimension is processed in chunks of C rows; the carry threads      #
#  between chunk calls, so arbitrary sequence lengths reuse one executable.   #
# --------------------------------------------------------------------------- #
def _chunk_step_single(carry, ref_chunk, qry_window, win_off, rows_start, rlen, qlen, ms, W, *, C, B):
    """Run C DP rows [rows_start, rows_start + C) for one problem.

    ref_chunk [C]: IUPAC masks of ref[i-1] for those rows.
    qry_window [C + B]: IUPAC masks of qry starting at column win_off (i.e.
    qry_window[j] = qry_mask[win_off + j]); covers every band column the chunk
    touches since lo is 1-Lipschitz.
    """
    H_prev, qgap, lo_prev, pprev_hi = carry
    k = jnp.arange(B, dtype=jnp.int32)

    def row(carry, r):
        H_prev, qgap, lo_prev, pprev_hi = carry
        i = rows_start + r
        lo = band_lo(i, ms, W, qlen, B)
        shift = lo - lo_prev
        qpos = lo + k
        in_matrix = (qpos <= qlen) & (i <= rlen)
        edge_hi = k == B - 1
        edge_lo = k == 0

        H_diag = jnp.where(shift == 1, H_prev, jnp.roll(H_prev, 1))
        H_diag = jnp.where((shift == 0) & edge_lo, NO_ALIGN, H_diag)
        diag_valid = (qpos - 1 >= lo_prev) & (qpos - 1 < lo_prev + B) & (qpos >= 1) & in_matrix
        H_up = jnp.where(shift == 0, H_prev, jnp.roll(H_prev, -1))
        qgap_up = jnp.where(shift == 0, qgap, jnp.roll(qgap, -1))
        H_up = jnp.where((shift == 1) & edge_hi, NO_ALIGN, H_up)
        qgap_up = jnp.where((shift == 1) & edge_hi, NO_ALIGN, qgap_up)
        up_valid = (qpos < lo_prev + B) & (qpos >= 1) & in_matrix

        rm = ref_chunk[r].astype(jnp.int32)
        # qry_mask[qpos - 1] = qry_window[qpos - 1 - win_off]
        qm = jnp.take(qry_window, qpos - 1 - win_off, mode="clip").astype(jnp.int32)
        unknown = (rm == 15) | (qm == 15)
        compat = (rm & qm) > 0
        msub = jnp.where(unknown, SCORE_MATCH - 1, jnp.where(compat, SCORE_MATCH, -PENALTY_MISMATCH))
        M = jnp.where(diag_valid, H_diag + msub, NO_ALIGN)
        interior = (qpos >= 1) & (i < rlen) & (qpos < qlen) & in_matrix
        path = jnp.where(~diag_valid & interior, BOUNDARY, 0).astype(jnp.int32)

        q_free = qpos == qlen
        q_open_val = jnp.where(q_free, H_up, H_up - GAP_OPEN)
        q_ext_allowed = (qgap_up >= q_open_val) & (qpos < pprev_hi)
        QG = jnp.where(up_valid, jnp.where(q_ext_allowed, qgap_up, q_open_val), NO_ALIGN)
        path = path | jnp.where(up_valid & q_ext_allowed, QRY_GAP_EXTEND, 0)
        path = path | jnp.where(~up_valid & interior, BOUNDARY, 0)
        new_qgap = jnp.where(up_valid, QG, NO_ALIGN)

        first_col = (qpos == 0) & in_matrix
        M = jnp.where(first_col, 0, M)
        NQ = jnp.maximum(M, QG)

        gap_cost = jnp.where(i == rlen, 0, GAP_OPEN)
        seed = jnp.concatenate([jnp.full((1,), NO_ALIGN), NQ[:-1] - gap_cost])
        G = jax.lax.associative_scan(jnp.maximum, seed)
        G = jnp.where(edge_lo, NO_ALIGN, G)
        path = path | jnp.where(edge_lo & interior, BOUNDARY, 0)
        prevG = jnp.concatenate([jnp.full((1,), NO_ALIGN), G[:-1]])
        Hm1 = jnp.maximum(NQ, G)
        r_open_prev = jnp.concatenate([jnp.full((1,), NO_ALIGN), Hm1[:-1] - gap_cost])
        r_ext = (prevG >= r_open_prev) & (k > 1)
        path = path | jnp.where((G > NO_ALIGN) & r_ext, REF_GAP_EXTEND, 0)

        best_mr = jnp.where(G >= M, G, M)
        origin_mr = jnp.where(G >= M, REF_GAP_MATRIX, MATCH)
        H = jnp.where(QG >= best_mr, QG, best_mr)
        origin = jnp.where(QG >= best_mr, QRY_GAP_MATRIX, origin_mr)

        H = jnp.where(first_col, 0, H)
        origin = jnp.where(first_col, QRY_GAP_MATRIX, origin)
        path = jnp.where(first_col, QRY_GAP_EXTEND, path)
        path = path | origin
        H = jnp.where(in_matrix, H, NO_ALIGN)
        path = jnp.where(in_matrix, path, 0)

        live = i <= rlen
        H_out = jnp.where(live, H, H_prev)
        qgap_out = jnp.where(live, new_qgap, qgap)
        lo_out = jnp.where(live, lo, lo_prev)
        pprev_out = jnp.where(live, lo_prev + B, pprev_hi)
        return (H_out, qgap_out, lo_out, pprev_out), path.astype(jnp.int8)

    carry, paths = jax.lax.scan(row, carry, jnp.arange(C, dtype=jnp.int32))
    return carry, paths


@functools.partial(jax.jit, static_argnames=("C", "B"))
def stripe_chunk_batch(H, qgap, lo_prev, pprev_hi, ref_chunk, qry_window, win_off, rows_start, rlen, qlen, ms, W, C: int, B: int):
    """Batched chunk step. All leading dims = batch except rows_start (scalar)."""
    def one(H, qgap, lo_prev, pprev_hi, ref_chunk, qry_window, win_off, rlen, qlen, ms, W):
        return _chunk_step_single(
            (H, qgap, lo_prev, pprev_hi), ref_chunk, qry_window, win_off, rows_start, rlen, qlen, ms, W, C=C, B=B
        )
    return jax.vmap(one)(H, qgap, lo_prev, pprev_hi, ref_chunk, qry_window, win_off, rlen, qlen, ms, W)


def init_carry(batch: int, qlen, ms, W, B: int):
    """Row-0 carry: free leading insertion across the band (numpy, host)."""
    import numpy as np

    lo0 = np.clip(-ms - W, 0, np.maximum(qlen + 1 - B, 0)).astype(np.int32)
    k = np.arange(B, dtype=np.int32)
    H0 = np.where(lo0[:, None] + k[None, :] <= qlen[:, None], 0, int(NO_ALIGN)).astype(np.int32)
    qgap0 = np.full((batch, B), int(NO_ALIGN), dtype=np.int32)
    return H0, qgap0, lo0, np.zeros(batch, dtype=np.int32)


@functools.partial(jax.jit, static_argnames=("R_pad", "B"))
def stripe_single(ref_mask, qry_mask, rlen, qlen, ms, W, R_pad: int, B: int):
    """One problem: returns (paths [R_pad, B] for rows 1..R_pad, H_last [B]).

    Row 0 is implicit: H = 0 across its band (free leading insertion); a
    backtrace reaching row 0 emits the remaining query as a leading Ins."""
    qry_mask_padded = jnp.concatenate([jnp.zeros(1, dtype=qry_mask.dtype), qry_mask])
    lo0 = band_lo(0, ms, W, qlen, B)
    k = jnp.arange(B, dtype=jnp.int32)
    H0 = jnp.where(lo0 + k <= qlen, 0, NO_ALIGN)
    qgap0 = jnp.full((B,), NO_ALIGN)
    carry = (H0, qgap0, lo0, jnp.int32(0))

    step = functools.partial(
        _row_step, B=B, ref_mask=ref_mask, qry_mask_padded=qry_mask_padded, rlen=rlen, qlen=qlen, ms=ms, W=W
    )
    (H_last, _, _, _), paths = jax.lax.scan(step, carry, jnp.arange(1, R_pad + 1, dtype=jnp.int32), unroll=4)
    return paths, H_last


def stripe_batch(ref_mask_b, qry_mask_b, rlen_b, qlen_b, ms_b, W_b, R_pad: int, B: int):
    """vmapped kernel over one (R_pad, B) bucket of problems."""
    fn = functools.partial(stripe_single, R_pad=R_pad, B=B)
    return jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0))(ref_mask_b, qry_mask_b, rlen_b, qlen_b, ms_b, W_b)


stripe_batch_jit = jax.jit(stripe_batch, static_argnames=("R_pad", "B"))
