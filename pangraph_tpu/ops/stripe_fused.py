"""Fused banded alignment: forward DP + traceback in one device call.

Motivation: the traceback-matrix transfer and per-chunk dispatches dominate
when the host link is slow (and still cost real time on production TPU hosts).
This kernel keeps the [m, R_cap, B] traceback bits in HBM, walks them with an
on-device while_loop, and returns only compact per-problem results:

- RLE cigar ops [m, MAX_OPS, 2] (op code, run length), emitted end-to-start
- substitutions [m, MAX_SUBS, 2] (ref pos, query char)
- leading-insertion length, boundary + overflow flags

Host post-processing turns these into Edit objects with two short loops over
the op/sub counts (O(#indels), not O(sequence length)).

Shapes are static per (M_BATCH, R_cap, B) tier; the driver pads problems into
fixed tiers so each tier compiles exactly once (persistently cached).
DP row semantics are identical to ops/stripe_tpu.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pangraph_tpu.ops.stripe_tpu import (
    BOUNDARY,
    GAP_OPEN,
    MATCH,
    NO_ALIGN,
    PENALTY_MISMATCH,
    QRY_GAP_EXTEND,
    QRY_GAP_MATRIX,
    REF_GAP_EXTEND,
    REF_GAP_MATRIX,
    SCORE_MATCH,
    band_lo,
)

OP_M, OP_I, OP_D = 0, 1, 2


def _dp_row(H_prev, qgap, lo_prev, pprev_hi, i, ref_mask_row, qry_mask_pad, rlen, qlen, ms, W, B):
    """One DP row for one problem (same recurrence as stripe_tpu._row_step)."""
    k = jnp.arange(B, dtype=jnp.int32)
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

    rm = ref_mask_row.astype(jnp.int32)
    qm = jnp.take(qry_mask_pad, qpos, mode="clip").astype(jnp.int32)  # qry_mask[qpos-1]
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
    return (
        jnp.where(live, H, H_prev),
        jnp.where(live, new_qgap, qgap),
        jnp.where(live, lo, lo_prev),
        jnp.where(live, lo_prev + B, pprev_hi),
        path.astype(jnp.int8),
    )


@functools.partial(jax.jit, static_argnames=("R_cap", "B", "MAX_OPS", "MAX_SUBS"))
def stripe_align_fused(
    ref_seq, qry_seq, ref_mask, qry_mask, rlen, qlen, ms, W, R_cap: int, B: int, MAX_OPS: int = 1024, MAX_SUBS: int = 8192
):
    """Forward DP + on-device traceback for a fixed-shape problem tier.

    All inputs are batched [m, ...]; sequences/masks padded to R_cap (ref) and
    R_cap + B (qry). Returns dict of compact per-problem results."""
    m = ref_seq.shape[0]
    k = jnp.arange(B, dtype=jnp.int32)

    qry_mask_pad = jnp.concatenate([jnp.zeros((m, 1), dtype=qry_mask.dtype), qry_mask], axis=1)

    lo0 = jax.vmap(lambda q, s, w: band_lo(0, s, w, q, B))(qlen, ms, W)
    H0 = jnp.where(lo0[:, None] + k[None, :] <= qlen[:, None], 0, NO_ALIGN)
    qgap0 = jnp.full((m, B), NO_ALIGN)
    paths0 = jnp.zeros((m, R_cap, B), dtype=jnp.int8)

    max_rows = jnp.max(rlen)
    KROWS = 8  # rows per loop iteration: amortizes loop overhead

    def dp_block(b, state):
        H, qgap, lo_prev, pprev, paths = state
        i0 = 1 + b * KROWS
        rows = []
        for r in range(KROWS):
            i = i0 + r
            H, qgap, lo_prev, pprev, path_row = jax.vmap(
                _dp_row, in_axes=(0, 0, 0, 0, None, 0, 0, 0, 0, 0, 0, None)
            )(H, qgap, lo_prev, pprev, i, ref_mask[:, jnp.maximum(i - 1, 0)], qry_mask_pad, rlen, qlen, ms, W, B)
            rows.append(path_row)
        block = jnp.stack(rows, axis=1)  # [m, KROWS, B]
        paths = jax.lax.dynamic_update_slice(paths, block, (0, i0 - 1, 0))
        return H, qgap, lo_prev, pprev, paths

    n_blocks = (max_rows + KROWS - 1) // KROWS
    H, qgap, lo_prev, pprev, paths = jax.lax.fori_loop(
        0, n_blocks, dp_block, (H0, qgap0, lo0, jnp.zeros(m, jnp.int32), paths0)
    )

    return traceback_rle(paths, ref_seq, qry_seq, rlen, qlen, ms, W, B, MAX_OPS, MAX_SUBS, clamped=True)


def traceback_rle(paths, ref_seq, qry_seq, rlen, qlen, ms, W, B: int, MAX_OPS: int, MAX_SUBS: int, clamped: bool):
    """On-device traceback over banded path bits -> compact RLE results.

    clamped=True uses the clip-dragged band of stripe_tpu.band_lo; False uses
    the pure diagonal band (lo = i - ms - W) of the Pallas kernel."""
    m = ref_seq.shape[0]
    R_cap = paths.shape[1]

    def lo_of(i):
        if clamped:
            return jax.vmap(lambda ii, s, w, ql: band_lo(ii, s, w, ql, B))(i, ms, W, qlen)
        return i - ms - W

    # state per problem
    i0 = rlen
    q0 = qlen
    ops = jnp.zeros((m, MAX_OPS, 2), dtype=jnp.int32)
    subs = jnp.zeros((m, MAX_SUBS, 2), dtype=jnp.int32)

    TB_UNROLL = 4

    def tb_cond(st):
        return jnp.any(~st["done"]) & (st["iters"] < 2 * R_cap + 4 * B + 16 + TB_UNROLL)

    def tb_body(st):
        for _ in range(TB_UNROLL):
            st = _tb_move(st)
        return st

    def _tb_move(st):
        i, q = st["i"], st["q"]
        active = ~st["done"]
        lo_i = lo_of(i)
        kk = q - lo_i
        in_band = (kk >= 0) & (kk < B) & (i >= 1)
        bits = paths[jnp.arange(m), jnp.maximum(i - 1, 0), jnp.clip(kk, 0, B - 1)].astype(jnp.int32)
        bits = jnp.where(in_band, bits, 0)
        dead = active & (i >= 1) & ((bits == 0) | ~in_band)

        boundary = st["boundary"] | (active & ((bits & BOUNDARY) > 0))
        state = st["state"]
        take_m = active & (i >= 1) & ((bits & MATCH) > 0) & (state == 0)
        take_r = active & (i >= 1) & ~take_m & ((((bits & REF_GAP_MATRIX) > 0) & (state == 0)) | (state == REF_GAP_MATRIX))
        take_q = active & (i >= 1) & ~take_m & ~take_r & (
            (((bits & QRY_GAP_MATRIX) > 0) & (state == 0)) | (state == QRY_GAP_MATRIX)
        )
        at_top = active & (i == 0)

        move_op = jnp.where(take_m, OP_M, jnp.where(take_r, OP_I, OP_D))

        # flush current run if the op changes
        flush = (active & ~at_top & (move_op != st["cur_op"]) & (st["cur_len"] > 0)) | (at_top & (st["cur_len"] > 0))
        n_ops = st["n_ops"]
        op_overflow = st["overflow"] | (flush & (n_ops >= MAX_OPS))
        widx = jnp.clip(n_ops, 0, MAX_OPS - 1)
        new_ops = st["ops"].at[jnp.arange(m), widx, 0].set(
            jnp.where(flush, st["cur_op"], st["ops"][jnp.arange(m), widx, 0])
        )
        new_ops = new_ops.at[jnp.arange(m), widx, 1].set(
            jnp.where(flush, st["cur_len"], new_ops[jnp.arange(m), widx, 1])
        )
        n_ops = jnp.where(flush, n_ops + 1, n_ops)
        cur_op = jnp.where(flush | (st["cur_len"] == 0), move_op, st["cur_op"])
        cur_len = jnp.where(flush, 0, st["cur_len"])

        # substitution detection on match moves
        rc = ref_seq[jnp.arange(m), jnp.maximum(i - 1, 0)]
        qc = qry_seq[jnp.arange(m), jnp.clip(q - 1, 0, qry_seq.shape[1] - 1)]
        is_sub = take_m & (rc != qc)
        n_subs = st["n_subs"]
        sub_overflow = op_overflow | (is_sub & (n_subs >= MAX_SUBS))
        sidx = jnp.clip(n_subs, 0, MAX_SUBS - 1)
        new_subs = st["subs"].at[jnp.arange(m), sidx, 0].set(
            jnp.where(is_sub, i - 1, st["subs"][jnp.arange(m), sidx, 0])
        )
        new_subs = new_subs.at[jnp.arange(m), sidx, 1].set(
            jnp.where(is_sub, qc.astype(jnp.int32), new_subs[jnp.arange(m), sidx, 1])
        )
        n_subs = jnp.where(is_sub, n_subs + 1, n_subs)

        # apply moves
        di = jnp.where(take_m | take_q, 1, 0)
        dq = jnp.where(take_m | take_r, 1, 0)
        moved = take_m | take_r | take_q
        new_i = jnp.where(active, i - di, i)
        new_q = jnp.where(active, q - dq, q)
        cur_len = jnp.where(moved, cur_len + 1, cur_len)

        new_state = jnp.where(
            take_r,
            jnp.where((bits & REF_GAP_EXTEND) > 0, REF_GAP_MATRIX, 0),
            jnp.where(take_q, jnp.where((bits & QRY_GAP_EXTEND) > 0, QRY_GAP_MATRIX, 0), state),
        )
        new_state = jnp.where(active, new_state, state)

        lead_ins = jnp.where(at_top, q, st["lead_ins"])
        done = st["done"] | at_top | dead
        dead_flag = st["dead"] | dead

        return {
            "i": new_i,
            "q": new_q,
            "state": new_state,
            "ops": new_ops,
            "subs": new_subs,
            "n_ops": n_ops,
            "n_subs": n_subs,
            "cur_op": cur_op,
            "cur_len": cur_len,
            "boundary": boundary,
            "overflow": sub_overflow,
            "lead_ins": lead_ins,
            "done": done,
            "dead": dead_flag,
            "iters": st["iters"] + 1,
        }

    st = {
        "i": i0,
        "q": q0,
        "state": jnp.zeros(m, jnp.int32),
        "ops": ops,
        "subs": subs,
        "n_ops": jnp.zeros(m, jnp.int32),
        "n_subs": jnp.zeros(m, jnp.int32),
        "cur_op": jnp.full((m,), -1, jnp.int32),
        "cur_len": jnp.zeros(m, jnp.int32),
        "boundary": jnp.zeros(m, bool),
        "overflow": jnp.zeros(m, bool),
        "lead_ins": jnp.zeros(m, jnp.int32),
        "done": rlen == 0,
        "dead": jnp.zeros(m, bool),
        "iters": jnp.int32(0),
    }
    st = jax.lax.while_loop(tb_cond, tb_body, st)
    not_finished = ~st["done"]

    boundary = st["boundary"] | st["dead"] | not_finished
    overflow = st["overflow"] | st["dead"] | not_finished
    # meta [m, 5]: one D2H transfer carries all per-problem scalars (the
    # tunnel's ~50 ms per-transfer latency dominates small fetches)
    meta = jnp.stack(
        [st["n_ops"], st["n_subs"], st["lead_ins"], boundary.astype(jnp.int32), overflow.astype(jnp.int32)],
        axis=1,
    )
    return {
        "ops": st["ops"],
        "n_ops": st["n_ops"],
        "subs": st["subs"],
        "n_subs": st["n_subs"],
        "lead_ins": st["lead_ins"],
        "boundary": boundary,
        "overflow": overflow,
        "meta": meta,
    }
