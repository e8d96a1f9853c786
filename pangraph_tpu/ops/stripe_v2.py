"""Stripe DP v2: static-op Pallas kernel in window coordinates + run-jump
traceback.

Why v2. The v1 kernel (ops/stripe_pallas.py) extracts the per-row reference
char and query band with *dynamic-amount* `pltpu.roll`s — multi-microsecond
ops on TPU that cap it at ~0.2 Gcells/s. v2 reformulates the band DP so every
per-row operation is static:

- **window coordinates**: with the pre-shifted query qsh[t] = qry[t - ms - W],
  row i's band is qsh[i : i+B). For a C-row chunk starting at row c*C+1, all
  rows' bands live inside the static window t in [c*C+1, c*C+1+2C) (C == B).
  Window lane l = t - (c*C + 1); row i band k maps to l = (i-1-c*C) + k.
  Diagonal predecessor = lane l-1 (one static roll), vertical = same lane,
  horizontal = exclusive lane prefix-max. The band edge marches as an iota
  compare against the row index — no dynamic slicing anywhere.
- **run counters for traceback**: each cell's output packs its origin bits
  with the length of the consecutive diagonal(MATCH)-origin run ending at it
  (int16: bits | run << 6, run capped at 1023). The traceback then *jumps*
  whole match runs instead of walking row by row — the walk cost scales with
  the number of edits, not the alignment length.
- **event-only records + top_k compaction**: the walk writes a rec word only
  at indel events (D rows, M rows with a trailing insertion run). Events are
  compacted with jax.lax.top_k (no XLA scatters, which are serial on TPU) and
  the host reconstructs the RLE alignment; substitutions inside match runs
  are recovered by vectorized numpy compares of ref[a:b] vs qry[a+d:b+d].

Role in the framework: this is the K3 kernel of SURVEY.md §7 — the batched
banded aligner replacing the reference's ksw2 extension (align.c/ksw2_*) and
the simplestripe re-aligner (align/nextclade/align/score_matrix.rs:23,
backtrace.rs:17). Scoring matches params.rs:142-176: match 3, mismatch -1,
gap open 6, extend 0, free terminal gaps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MATCH = 1
REF_GAP_MATRIX = 2
QRY_GAP_MATRIX = 4
REF_GAP_EXTEND = 8
QRY_GAP_EXTEND = 16
BOUNDARY = 32

NO_ALIGN = -1_000_000_000
SCORE_MATCH = 3
PENALTY_MISMATCH = 1
GAP_OPEN = 6

G = 16  # default problems per group; large tiers use smaller groups (see g=)
RUN_CAP = (1 << 10) - 1  # run counter shares an int16 record with 6 origin bits

OP_M = 1
OP_D = 2

# walk-state SMEM slots
S_I, S_Q, S_STATE, S_INS, S_DEAD, S_BND = 0, 1, 2, 3, 4, 5


def _prefix_max_exclusive(x, G_, WN):
    """Exclusive running max along lanes of [G_, WN] int32."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (G_, WN), 1)
    y = pltpu.roll(x, 1, axis=1)
    y = jnp.where(lane >= 1, y, NO_ALIGN)
    s = 1
    while s < WN:
        z = pltpu.roll(y, s, axis=1)
        z = jnp.where(lane >= s + 1, z, NO_ALIGN)
        y = jnp.maximum(y, z)
        s *= 2
    return y


def _chunk_compute(c, qm, ref_val, carry, rec_sink, *, C: int, B: int, G_: int,
                   rlen_v, qlen_v, ms_v, W_v):
    """Run the C rows of global DP chunk `c` (rows c*C+1 .. c*C+C).

    carry = (H, qg, run) arrays [G_, WN] expressed in this chunk's window;
    qm [G_, WN] int32 query masks for the window, ref_val [G_, C] int32 ref
    masks for the chunk's rows. rec_sink(rg, rows) receives each KR-row
    record block (rows: list of [G_, WN] int32 rec words) — pass None to run
    the DP for its carries only (checkpoint pass). Returns the new carry.
    This is the single definition of the banded DP row recurrence, shared by
    the paths-emitting kernel, the checkpoint pass, and the walk's re-derive
    pass."""
    WN = B + C
    lane = jax.lax.broadcasted_iota(jnp.int32, (G_, WN), 1)
    qpos = c * C + 1 + lane - ms_v - W_v
    q_ok = (qpos >= 0) & (qpos <= qlen_v)

    KR = 16  # rows per aligned int16 store (fully unrolled per block)

    # loop invariants hoisted out of the row body
    qpos1 = qpos >= 1
    qzero = qpos == 0
    q_free = qpos == qlen_v
    q_lt = qpos < qlen_v
    qm15 = qm == 15
    lane0 = lane == 0

    def row_body(j, carry):
        H_prev, qgap, run_prev, ref_rot = carry
        i = c * C + j + 1
        inband = (lane >= j) & (lane < j + B)
        in_matrix = q_ok & (i <= rlen_v) & inband

        # this row's reference char: column 0 of the rotating ref carry
        rm = jax.lax.slice_in_dim(ref_rot, 0, 1, axis=1)  # [G, 1]
        ref_rot = pltpu.roll(ref_rot, C - 1, axis=1)

        H_diag = pltpu.roll(H_prev, 1, axis=1)
        H_diag = jnp.where(lane0, NO_ALIGN, H_diag)
        run_d = pltpu.roll(run_prev, 1, axis=1)
        run_d = jnp.where(lane0, 0, run_d)

        diag_valid = qpos1 & in_matrix
        edge_hi = lane == j + B - 1
        edge_lo = lane == j
        up_valid = ~edge_hi & qpos1 & in_matrix

        unknown = (rm == 15) | qm15
        compat = (rm & qm) > 0
        msub = jnp.where(unknown, SCORE_MATCH - 1, jnp.where(compat, SCORE_MATCH, -PENALTY_MISMATCH))
        M = jnp.where(diag_valid, H_diag + msub, NO_ALIGN)
        interior = qpos1 & (i < rlen_v) & q_lt & in_matrix
        path = jnp.where(~diag_valid & interior, BOUNDARY, 0)

        q_open_val = jnp.where(q_free, H_prev, H_prev - GAP_OPEN)
        q_ext_allowed = (qgap >= q_open_val) & (lane - j < B - 2)
        QG = jnp.where(up_valid, jnp.where(q_ext_allowed, qgap, q_open_val), NO_ALIGN)
        path = path | jnp.where(up_valid & q_ext_allowed, QRY_GAP_EXTEND, 0)
        path = path | jnp.where(~up_valid & interior, BOUNDARY, 0)
        new_qgap = jnp.where(up_valid, QG, NO_ALIGN)

        first_col = qzero & in_matrix
        M = jnp.where(first_col, 0, M)
        NQ = jnp.maximum(M, QG)

        gap_cost = jnp.where(i == rlen_v, 0, GAP_OPEN)
        P = jnp.where(in_matrix, NQ - gap_cost, NO_ALIGN)
        Gv = _prefix_max_exclusive(P, G_, WN)
        Gv = jnp.where(edge_lo | ~in_matrix, NO_ALIGN, Gv)
        path = path | jnp.where(edge_lo & interior, BOUNDARY, 0)
        prevG = pltpu.roll(Gv, 1, axis=1)
        prevG = jnp.where(edge_lo, NO_ALIGN, prevG)
        Hm1 = jnp.maximum(NQ, Gv)
        r_open_prev = pltpu.roll(Hm1 - gap_cost, 1, axis=1)
        r_open_prev = jnp.where(edge_lo, NO_ALIGN, r_open_prev)
        r_ext = (prevG >= r_open_prev) & (lane - j > 1)
        path = path | jnp.where((Gv > NO_ALIGN) & r_ext, REF_GAP_EXTEND, 0)

        best_mr = jnp.where(Gv >= M, Gv, M)
        origin_mr = jnp.where(Gv >= M, REF_GAP_MATRIX, MATCH)
        H = jnp.where(QG >= best_mr, QG, best_mr)
        origin = jnp.where(QG >= best_mr, QRY_GAP_MATRIX, origin_mr)

        H = jnp.where(first_col, 0, H)
        origin = jnp.where(first_col, QRY_GAP_MATRIX, origin)
        path = jnp.where(first_col, QRY_GAP_EXTEND, path)
        path = path | origin
        H = jnp.where(in_matrix, H, NO_ALIGN)
        path = jnp.where(in_matrix, path, 0)

        # the carry run is UNCAPPED (int32): the ckpt walk refreshes walker
        # jump budgets from window-start carries, so a multi-Mbp diagonal
        # run can be crossed without re-deriving any window. Only the int16
        # record caps at RUN_CAP.
        is_m = (path & MATCH) > 0
        run = jnp.where(is_m & in_matrix, run_d + 1, 0)
        rec32 = path | (jnp.minimum(run, RUN_CAP) << 6)

        live = i <= rlen_v
        H_out = jnp.where(live, H, H_prev)
        qg_out = jnp.where(live, new_qgap, qgap)
        run_out = jnp.where(live, run, run_prev)
        return (H_out, qg_out, run_out, ref_rot), rec32

    def block_body(rg, carry):
        # fully unrolled KR-row block: rows collected in registers; the sink
        # writes them with ONE aligned store (or drops them)
        rows = []
        for u in range(KR):
            carry, rec32 = row_body(rg * KR + u, carry)
            rows.append(rec32)
        if rec_sink is not None:
            rec_sink(rg, rows)
        return carry

    H0, qg0, run0 = carry
    H_fin, qg_fin, run_fin, _ = jax.lax.fori_loop(
        0, C // KR, block_body, (H0, qg0, run0, ref_val)
    )
    return H_fin, qg_fin, run_fin


def _dp_kernel(
    rlen_ref, qlen_ref, ms_ref, W_ref, gmax_ref,  # SMEM scalars
    ref_chunk_ref,  # [G_, C] int32 ref mask chunk
    *qsh_and_out,  # WN//C pre-shifted query chunks [G_, C] u8, paths out, 3 scratch
    C: int, B: int, G_: int,
):
    WN = B + C
    n_q = WN // C
    qsh_refs = qsh_and_out[:n_q]
    paths_ref = qsh_and_out[n_q]  # out [G, C, WN] int16: origin bits | run << 6
    # int16 records halve both HBM footprint and store bandwidth vs int32 —
    # the DP is store-bound, and paths bytes cap the largest alignable block
    H_ref, qg_ref, run_ref = qsh_and_out[n_q + 1 :]  # VMEM scratch [G, WN] int32
    g = pl.program_id(0)
    c = pl.program_id(1)

    def vec8(ref):
        sub = jax.lax.broadcasted_iota(jnp.int32, (G_, 1), 0)
        v = jnp.zeros((G_, 1), jnp.int32)
        for j in range(G_):
            v = jnp.where(sub == j, ref[g, j], v)
        return v

    rlen_v = vec8(rlen_ref)
    qlen_v = vec8(qlen_ref)
    ms_v = vec8(ms_ref)
    W_v = vec8(W_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G_, WN), 1)
    clane = jax.lax.broadcasted_iota(jnp.int32, (G_, C), 1)

    # query position of window lane l: q = c*C + 1 + l - ms - W
    qpos = c * C + 1 + lane - ms_v - W_v
    q_ok = (qpos >= 0) & (qpos <= qlen_v)

    @pl.when(c == 0)
    def _init():
        # virtual row 0: free leading insertion wherever q is in range
        H_ref[:] = jnp.where(q_ok, 0, NO_ALIGN)
        qg_ref[:] = jnp.full((G_, WN), NO_ALIGN, dtype=jnp.int32)
        run_ref[:] = jnp.zeros((G_, WN), dtype=jnp.int32)

    @pl.when(c > 0)
    def _shift():
        # re-express carries in this chunk's window (origin moved +C lanes):
        # new[l] = old[l + C]; vacated upper lanes get row-0-style values for
        # lanes whose q just entered range (only relevant while i <= ...),
        # NO_ALIGN otherwise — rows below read them masked by band checks.
        fill = lane >= WN - C
        H_ref[:] = jnp.where(fill, NO_ALIGN, pltpu.roll(H_ref[:], WN - C, axis=1))
        qg_ref[:] = jnp.where(fill, NO_ALIGN, pltpu.roll(qg_ref[:], WN - C, axis=1))
        run_ref[:] = jnp.where(fill, 0, pltpu.roll(run_ref[:], WN - C, axis=1))

    group_max = gmax_ref[g, 0]

    @pl.when(c * C < group_max)
    def _compute():
        # char consumed by a diagonal move into (i, q) is qry[q-1], i.e.
        # qsh[i - 1 + k] = qsh[c*C + l] for window lane l
        qm = jnp.concatenate([r[:].astype(jnp.int32) for r in qsh_refs], axis=1)  # [G, WN]
        ref_val = ref_chunk_ref[:]  # [G, C] int32

        def sink(rg, rows):
            idx = pl.multiple_of(rg * 16, 16)
            paths_ref[:, pl.ds(idx, 16), :] = jnp.stack(rows, axis=1).astype(jnp.int16)

        H_fin, qg_fin, run_fin = _chunk_compute(
            c, qm, ref_val, (H_ref[:], qg_ref[:], run_ref[:]), sink,
            C=C, B=B, G_=G_, rlen_v=rlen_v, qlen_v=qlen_v, ms_v=ms_v, W_v=W_v,
        )
        H_ref[:] = H_fin
        qg_ref[:] = qg_fin
        run_ref[:] = run_fin

    @pl.when(c * C >= group_max)
    def _skip():
        paths_ref[:] = jnp.zeros((G_, C, WN), dtype=jnp.int16)


DP_C = 128  # DP rows per grid chunk


def stripe_dp_v2(ref_mask, qsh_mask, rlen, qlen, ms, W, gmax, R_cap: int, B: int, g_size: int = G):
    """Banded stripe DP over [n, ...] problem arrays (n % g_size == 0).

    ref_mask [n, R_cap] int32 IUPAC masks; qsh_mask [n, R_cap + B] uint8
    pre-shifted query masks (qsh[t] = qry_mask[t - ms - W]).
    Returns paths [n, R_cap, B + DP_C] int16: origin bits | run << 6, rows
    1..R_cap in window coordinates (row i, band k at lane (i-1) % DP_C + k).
    g_size = problems per kernel group (smaller groups for memory-bound
    large tiers; HBM per problem = R_cap * (B + 128) * 2 bytes).
    """
    C = DP_C
    WN = B + C
    n = ref_mask.shape[0]
    assert n % g_size == 0 and R_cap % C == 0 and B % C == 0
    assert qsh_mask.shape[1] == R_cap + B
    n_groups = n // g_size
    n_chunks = R_cap // C
    grid = (n_groups, n_chunks)

    def smem():
        return pl.BlockSpec(memory_space=pltpu.SMEM)

    def qspec(t):
        return pl.BlockSpec((g_size, C), lambda g, c, t=t: (g, c + t), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_dp_kernel, C=C, B=B, G_=g_size),
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[smem(), smem(), smem(), smem(), smem()]
        + [pl.BlockSpec((g_size, C), lambda g, c: (g, c), memory_space=pltpu.VMEM)]
        + [qspec(t) for t in range(WN // C)],
        out_specs=pl.BlockSpec((g_size, C, WN), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, R_cap, WN), jnp.int16),
        scratch_shapes=[
            pltpu.VMEM((g_size, WN), jnp.int32),
            pltpu.VMEM((g_size, WN), jnp.int32),
            pltpu.VMEM((g_size, WN), jnp.int32),
        ],
    )(
        rlen.reshape(n_groups, g_size),
        qlen.reshape(n_groups, g_size),
        ms.reshape(n_groups, g_size),
        W.reshape(n_groups, g_size),
        gmax.reshape(n_groups, 1),
        ref_mask,
        *([qsh_mask] * (WN // C)),
    )


def _dp_ckpt_kernel(
    rlen_ref, qlen_ref, ms_ref, W_ref, gmax_ref,  # SMEM scalars
    ref_chunk_ref,  # [G_, C] int32 ref mask chunk
    *qsh_and_out,  # WN//C query chunks, ckpt out, 3 scratch
    C: int, B: int, G_: int, S: int,
):
    """Checkpoint pass: identical DP recurrence, but instead of storing the
    full [R, WN] path records it saves the (H, qg, run) carry at the start of
    every S-chunk window. HBM per problem drops from R*WN*2 bytes to
    (R/(S*C))*3*WN*4 — the walk pass re-derives each window's records in
    VMEM. This is what lets Mbp-scale problems run on device at all."""
    WN = B + C
    n_q = WN // C
    qsh_refs = qsh_and_out[:n_q]
    ckpt_ref = qsh_and_out[n_q]  # out [G_, 1, 3, WN] int32
    H_ref, qg_ref, run_ref = qsh_and_out[n_q + 1 :]
    g = pl.program_id(0)
    c = pl.program_id(1)

    def vec8(ref):
        sub = jax.lax.broadcasted_iota(jnp.int32, (G_, 1), 0)
        v = jnp.zeros((G_, 1), jnp.int32)
        for j in range(G_):
            v = jnp.where(sub == j, ref[g, j], v)
        return v

    rlen_v = vec8(rlen_ref)
    qlen_v = vec8(qlen_ref)
    ms_v = vec8(ms_ref)
    W_v = vec8(W_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G_, WN), 1)
    qpos = c * C + 1 + lane - ms_v - W_v
    q_ok = (qpos >= 0) & (qpos <= qlen_v)

    @pl.when(c == 0)
    def _init():
        H_ref[:] = jnp.where(q_ok, 0, NO_ALIGN)
        qg_ref[:] = jnp.full((G_, WN), NO_ALIGN, dtype=jnp.int32)
        run_ref[:] = jnp.zeros((G_, WN), dtype=jnp.int32)

    @pl.when(c > 0)
    def _shift():
        fill = lane >= WN - C
        H_ref[:] = jnp.where(fill, NO_ALIGN, pltpu.roll(H_ref[:], WN - C, axis=1))
        qg_ref[:] = jnp.where(fill, NO_ALIGN, pltpu.roll(qg_ref[:], WN - C, axis=1))
        run_ref[:] = jnp.where(fill, 0, pltpu.roll(run_ref[:], WN - C, axis=1))

    # save the carry ready for this window's first chunk
    @pl.when(c % S == 0)
    def _save():
        ckpt_ref[:, 0, 0, :] = H_ref[:]
        ckpt_ref[:, 0, 1, :] = qg_ref[:]
        ckpt_ref[:, 0, 2, :] = run_ref[:]

    group_max = gmax_ref[g, 0]

    @pl.when(c * C < group_max)
    def _compute():
        qm = jnp.concatenate([r[:].astype(jnp.int32) for r in qsh_refs], axis=1)
        H_fin, qg_fin, run_fin = _chunk_compute(
            c, qm, ref_chunk_ref[:], (H_ref[:], qg_ref[:], run_ref[:]), None,
            C=C, B=B, G_=G_, rlen_v=rlen_v, qlen_v=qlen_v, ms_v=ms_v, W_v=W_v,
        )
        H_ref[:] = H_fin
        qg_ref[:] = qg_fin
        run_ref[:] = run_fin


def stripe_dp_ckpt(ref_mask, qsh_mask, rlen, qlen, ms, W, gmax, R_cap: int, B: int, S: int, g_size: int = G):
    """Checkpoint DP pass: returns carries [n, n_windows, 3, B+DP_C] int32,
    one per S-chunk window (window = S*DP_C rows)."""
    C = DP_C
    WN = B + C
    n = ref_mask.shape[0]
    assert n % g_size == 0 and R_cap % C == 0 and B % C == 0 and R_cap % (S * C) == 0
    n_groups = n // g_size
    n_chunks = R_cap // C
    n_windows = n_chunks // S
    grid = (n_groups, n_chunks)

    def smem():
        return pl.BlockSpec(memory_space=pltpu.SMEM)

    def qspec(t):
        return pl.BlockSpec((g_size, C), lambda g, c, t=t: (g, c + t), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_dp_ckpt_kernel, C=C, B=B, G_=g_size, S=S),
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[smem(), smem(), smem(), smem(), smem()]
        + [pl.BlockSpec((g_size, C), lambda g, c: (g, c), memory_space=pltpu.VMEM)]
        + [qspec(t) for t in range(WN // C)],
        out_specs=pl.BlockSpec(
            (g_size, 1, 3, WN), lambda g, c: (g, c // S, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, n_windows, 3, WN), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((g_size, WN), jnp.int32),
            pltpu.VMEM((g_size, WN), jnp.int32),
            pltpu.VMEM((g_size, WN), jnp.int32),
        ],
    )(
        rlen.reshape(n_groups, g_size),
        qlen.reshape(n_groups, g_size),
        ms.reshape(n_groups, g_size),
        W.reshape(n_groups, g_size),
        gmax.reshape(n_groups, 1),
        ref_mask,
        *([qsh_mask] * (WN // C)),
    )


# extra walk-state SMEM slots (beyond S_I..S_BND)
S_DEL, S_IA, S_CNT = 6, 7, 8
# remaining diagonal-run length carried across walk windows (ckpt walk):
# lets a walker cross whole windows without re-deriving their records
S_RUN = 9


def _walk_kernel(
    rlen_ref, qlen_ref, ms_ref, W_ref, paths_ref, rows_ref, words_ref, nev_ref, meta_ref, st_ref,
    *, C: int, B: int, cw: int, K: int,
):
    """Run-jumping traceback with direct event-list emission.

    Events are appended to a per-problem SMEM list (rows_ref/words_ref, one
    block of K int32 each) in walk order (descending row). Deletion runs are
    compressed into ONE event: word = OP_D | ins_after << 2 | del_len << 17,
    emitted at the run's lowest ref row (ins_after = the insertion run that
    follows the deletions in forward order). Match rows emit only when an
    insertion run trails them: word = OP_M | ins_len << 2. Pure-match
    stretches are jumped via the run counters in the DP records, so walk cost
    scales with the number of indel events, not the alignment length."""
    WN = B + C
    g = pl.program_id(0)
    c_rev = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    chunk = n_chunks - 1 - c_rev
    c0 = chunk * cw

    @pl.when(c_rev == 0)
    def _init():
        st_ref[S_I] = rlen_ref[g]
        st_ref[S_Q] = qlen_ref[g]
        st_ref[S_STATE] = 0
        st_ref[S_INS] = 0
        st_ref[S_DEAD] = 0
        st_ref[S_BND] = 0
        st_ref[S_DEL] = 0
        st_ref[S_IA] = 0
        st_ref[S_CNT] = 0

    msv = ms_ref[g]
    Wv = W_ref[g]
    # int16 path records: slabs are 16 sublanes (the int16 tile height); the
    # lane dim is sliced to the 128-aligned block holding the walker's lane,
    # so per-iteration element work is O(16x128) instead of O(16 x WN) —
    # at wide bands the walk is otherwise iteration-bound (WN=2176 reduces
    # cost ~17x more than necessary per step)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)

    def cond(carry):
        i, q, st, ins, dl, ia, cnt, dead, bnd = carry
        return (i > c0) & (dead == 0)

    def body(carry):
        i, q, st, ins, dl, ia, cnt, dead, bnd = carry
        li = i - 1 - c0  # row within walk chunk
        # window lane within the DP chunk holding row i (DP chunks are C rows)
        c0_dp = (i - 1) & ~(C - 1)
        l = q + msv + Wv - c0_dp - 1
        j = i - 1 - c0_dp
        in_band = (l >= j) & (l < j + B) & (l >= 0) & (l < WN)
        slab_at = pl.multiple_of((li >> 4) << 4, 16)
        lc = jnp.clip(l, 0, WN - 1)
        lane_blk = pl.multiple_of(jnp.minimum((lc >> 7) << 7, WN - 128), 128)
        slab = paths_ref[0, pl.ds(slab_at, 16), pl.ds(lane_blk, 128)].astype(jnp.int32)  # [16, 128]
        word = jnp.sum(jnp.where((sub16 == (li & 15)) & (lane128 == lc - lane_blk), slab, 0))
        # sign-extended int16 record -> unsigned 16-bit word
        word = jnp.where(in_band, word, 0) & 0xFFFF
        bits = word & 63
        runv = word >> 6
        bnd = bnd | ((bits & BOUNDARY) > 0).astype(jnp.int32)

        take_m = (st == 0) & ((bits & MATCH) > 0)
        take_i = ((st == 0) & ((bits & REF_GAP_MATRIX) > 0) & ~take_m) | (st == REF_GAP_MATRIX)
        take_d = ((st == 0) & ((bits & QRY_GAP_MATRIX) > 0) & ~take_m & ~take_i) | (st == QRY_GAP_MATRIX)
        new_dead = jnp.where((bits != 0) & (take_m | take_i | take_d), 0, 1)
        live = new_dead == 0

        # event emission: a non-D move ends any pending deletion run (emitted
        # at its lowest row = current i); an M move with a trailing insertion
        # run emits its own event. The two cannot coincide (ins is captured
        # into ia when the run starts, so dl > 0 implies ins == 0).
        emit_d = live & (take_m | take_i) & (dl > 0)
        emit_m = live & take_m & (ins > 0) & (dl == 0)
        do_emit = emit_d | emit_m
        row_e = jnp.where(emit_d, i, i - 1)
        word_e = jnp.where(emit_d, OP_D | (ia << 2) | (dl << 17), OP_M | (ins << 2))
        idx = jnp.minimum(cnt, K - 1)

        @pl.when(do_emit)
        def _emit():
            rows_ref[0, 0, idx] = row_e
            words_ref[0, 0, idx] = word_e

        cnt = cnt + do_emit.astype(jnp.int32)
        start_run = live & take_d & (dl == 0)
        new_ia = jnp.where(start_run, ins, jnp.where(emit_d, 0, ia))
        new_dl = jnp.where(live & take_d, dl + 1, jnp.where(emit_d, 0, dl))

        new_st = jnp.where(
            take_i,
            jnp.where((bits & REF_GAP_EXTEND) > 0, REF_GAP_MATRIX, 0),
            jnp.where(take_d, jnp.where((bits & QRY_GAP_EXTEND) > 0, QRY_GAP_MATRIX, 0), st),
        )
        # match-run jump: consume L diagonal moves at once (cap at chunk edge)
        L = jnp.where(take_m, jnp.minimum(jnp.maximum(runv, 1), i - c0), 0)
        di = jnp.where(take_m, L, jnp.where(take_d, 1, 0))
        dq = jnp.where(take_m, L, jnp.where(take_i, 1, 0))
        i = jnp.where(live, i - di, i)
        q = jnp.where(live, q - dq, q)
        ins = jnp.where(live, jnp.where(take_i, ins + 1, jnp.where(take_m | take_d, 0, ins)), ins)
        st = jnp.where(live, new_st, st)
        return i, q, st, ins, new_dl, new_ia, cnt, new_dead, bnd

    carry = (
        st_ref[S_I], st_ref[S_Q], st_ref[S_STATE], st_ref[S_INS],
        st_ref[S_DEL], st_ref[S_IA], st_ref[S_CNT], st_ref[S_DEAD], st_ref[S_BND],
    )
    i, q, st, ins, dl, ia, cnt, dead, bnd = jax.lax.while_loop(cond, body, carry)

    # a deletion run reaching row 0 is flushed once, at the end of the walk
    flush = (chunk == 0) & (i == 0) & (dead == 0) & (dl > 0)

    @pl.when(flush)
    def _flush():
        rows_ref[0, 0, jnp.minimum(cnt, K - 1)] = 0
        words_ref[0, 0, jnp.minimum(cnt, K - 1)] = OP_D | (ia << 2) | (dl << 17)

    cnt = cnt + flush.astype(jnp.int32)

    st_ref[S_I] = i
    st_ref[S_Q] = q
    st_ref[S_STATE] = st
    st_ref[S_INS] = ins
    st_ref[S_DEL] = dl
    st_ref[S_IA] = ia
    st_ref[S_CNT] = cnt
    st_ref[S_DEAD] = dead
    st_ref[S_BND] = bnd

    nev_ref[g] = cnt
    meta_ref[g, 0] = q  # lead insertion length (+ pending ins handled on host)
    meta_ref[g, 1] = dead | jnp.where(i > 0, 1, 0).astype(jnp.int32)
    meta_ref[g, 2] = bnd
    meta_ref[g, 3] = ins  # pending insertion run at walk end (prepends at pos 0)


def walk_v2(paths, rlen, qlen, ms, W, R_cap: int, B: int, K: int):
    """Traceback over v2 path records -> compact event lists.

    Returns (rows [m, K], words [m, K], n_events [m], meta [m, 4]); meta is
    (lead, dead, boundary, pending_ins). Events are in walk order (descending
    row); entries beyond n_events are garbage. n_events > K flags overflow."""
    C = DP_C
    WN = B + C
    m = paths.shape[0]
    # pick the walk chunk: bound the VMEM block to ~4 MB, <= R_cap, and a
    # DIVISOR of R_cap (tiers like 10240 = 5*2048 are not powers of two)
    cw = 1024
    while (
        cw * 2 <= min(R_cap, 8192)
        and cw * 2 * WN * 2 <= 4 * 1024 * 1024
        and R_cap % (cw * 2) == 0
    ):
        cw *= 2
    cw = min(cw, R_cap)
    assert R_cap % cw == 0, (R_cap, cw)
    n_chunks = R_cap // cw
    grid = (m, n_chunks)

    def ev_spec():
        return pl.BlockSpec((1, 1, K), lambda g, c: (g, 0, 0), memory_space=pltpu.SMEM)

    rows, words, nev, meta = pl.pallas_call(
        functools.partial(_walk_kernel, C=C, B=B, cw=cw, K=K),
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cw, WN), lambda g, c: (g, n_chunks - 1 - c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            ev_spec(),
            ev_spec(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, 1, K), jnp.int32),
            jax.ShapeDtypeStruct((m, 1, K), jnp.int32),
            jax.ShapeDtypeStruct((m,), jnp.int32),
            jax.ShapeDtypeStruct((m, 4), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((16,), jnp.int32)],
    )(rlen, qlen, ms, W, paths)
    return rows.reshape(m, K), words.reshape(m, K), nev, meta


def _walk_ckpt_kernel(
    rlen_ref, qlen_ref, ms_ref, W_ref, gmax_ref,  # SMEM [n_groups, G_] / [n_groups, 1]
    ckpt_ref,            # [G_, 1, 3, WN] int32: window-start carries
    ckpt_next_ref,       # [G_, 1, 3, WN] int32: NEXT window's start carry (= this window's end)
    ref_win_ref,         # [G_, WV] int32 ref masks for this window's rows
    *rest,               # n_qb query-mask blocks [G_, WV] u8, 4 outs, 2 scratch
    C: int, B: int, G_: int, S: int, K: int, n_windows: int, n_qb: int,
):
    """Run-jump traceback over checkpointed DP: each grid step re-derives one
    window's path records from its carry checkpoint (forward, in VMEM) and
    walks all G_ problems of the group backwards through it. No path records
    ever touch HBM — the walk's working set is one VMEM window."""
    WN = B + C
    WV = S * C
    qsh_refs = rest[:n_qb]
    rows_ref, words_ref, nev_ref, meta_ref = rest[n_qb : n_qb + 4]
    recs_ref, st_ref = rest[n_qb + 4 :]
    g = pl.program_id(0)
    w_rev = pl.program_id(1)
    w = n_windows - 1 - w_rev
    c0_rows = w * WV  # rows (i-1) in [c0_rows, c0_rows + WV)

    def vec8(ref):
        sub = jax.lax.broadcasted_iota(jnp.int32, (G_, 1), 0)
        v = jnp.zeros((G_, 1), jnp.int32)
        for j in range(G_):
            v = jnp.where(sub == j, ref[g, j], v)
        return v

    rlen_v = vec8(rlen_ref)
    qlen_v = vec8(qlen_ref)
    ms_v = vec8(ms_ref)
    W_v = vec8(W_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G_, WN), 1)

    @pl.when(w_rev == 0)
    def _init():
        for p in range(G_):
            st_ref[p, S_I] = rlen_ref[g, p]
            st_ref[p, S_Q] = qlen_ref[g, p]
            st_ref[p, S_STATE] = 0
            st_ref[p, S_INS] = 0
            st_ref[p, S_DEAD] = 0
            st_ref[p, S_BND] = 0
            st_ref[p, S_DEL] = 0
            st_ref[p, S_IA] = 0
            st_ref[p, S_CNT] = 0
            st_ref[p, S_RUN] = 0

    group_max = gmax_ref[g, 0]

    # window skip: a walker whose carried diagonal run (S_RUN) covers all
    # its rows in this window can cross it without reading a single record.
    # Run counters count consecutive diagonal moves (substitutions included;
    # only indels break them), so at ~1% divergence nearly every window is
    # all-diagonal for every walker and the whole re-derive pass is skipped
    # — this is what makes the wide-band (B=2048) checkpoint walk viable:
    # without it the walk is bound by windows x rows, not by events.
    #
    # Jump-budget refresh: a skipping walker always sits exactly on a window
    # boundary (jumps cap at c0_rows), i.e. on the row whose carry the NEXT
    # window's checkpoint stores. That carry's run plane is UNCAPPED int32,
    # so reading it at the walker's lane extends the skip horizon across an
    # entire inter-indel diagonal run (Mbp-scale) — int16 records cap runs
    # at RUN_CAP=1023, which would otherwise force a re-derive every
    # RUN_CAP/WV windows and desynchronize the group.
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, WN), 1)
    for p in range(G_):
        i_p = st_ref[p, S_I]
        at_boundary = (
            (st_ref[p, S_DEAD] == 0)
            & (i_p == c0_rows + S * C)
            & (st_ref[p, S_STATE] == 0)
            & (st_ref[p, S_RUN] < i_p - c0_rows)
            & (w < n_windows - 1)  # row R_cap has no saved carry
        )

        @pl.when(at_boundary & (i_p > 0))
        def _refresh(p=p, i_p=i_p):
            lp = st_ref[p, S_Q] + ms_ref[g, p] + W_ref[g, p] - i_p - 1
            run_c = jnp.sum(jnp.where(lane_row == lp, ckpt_next_ref[p, 0, 2:3, :], 0))
            st_ref[p, S_RUN] = jnp.maximum(st_ref[p, S_RUN], run_c)

    need_window = jnp.int32(0)
    for p in range(G_):
        i_p = st_ref[p, S_I]
        cnt_p = i_p - c0_rows
        live = (st_ref[p, S_DEAD] == 0) & (cnt_p > 0)
        need_window = need_window | (live & (st_ref[p, S_RUN] < cnt_p)).astype(jnp.int32)

    @pl.when((need_window == 0) & (c0_rows < group_max))
    def _skip_window():
        for p in range(G_):
            i_p = st_ref[p, S_I]
            cnt_p = i_p - c0_rows
            live = (st_ref[p, S_DEAD] == 0) & (cnt_p > 0)
            jump = jnp.where(live, cnt_p, 0)
            st_ref[p, S_I] = i_p - jump
            st_ref[p, S_Q] = st_ref[p, S_Q] - jump
            st_ref[p, S_RUN] = st_ref[p, S_RUN] - jump

    @pl.when((need_window > 0) & (c0_rows < group_max))
    def _rederive():
        qsh_cat = jnp.concatenate([r[:] for r in qsh_refs], axis=1).astype(jnp.int32)
        ref_win = ref_win_ref[:]

        def chunk_body(s, carry):
            H, qg, run = carry
            # re-express carries in chunk s's window (skip for the first
            # chunk: the checkpoint was captured exactly there)
            fill = lane >= WN - C
            H = jnp.where(s > 0, jnp.where(fill, NO_ALIGN, pltpu.roll(H, WN - C, axis=1)), H)
            qg = jnp.where(s > 0, jnp.where(fill, NO_ALIGN, pltpu.roll(qg, WN - C, axis=1)), qg)
            run = jnp.where(s > 0, jnp.where(fill, 0, pltpu.roll(run, WN - C, axis=1)), run)
            c = w * S + s
            qm = jax.lax.slice_in_dim(pltpu.roll(qsh_cat, n_qb * WV - s * C, axis=1), 0, WN, axis=1)
            refv = jax.lax.slice_in_dim(pltpu.roll(ref_win, WV - s * C, axis=1), 0, C, axis=1)

            def sink(rg, rows_):
                idx = pl.multiple_of(s * C + rg * 16, 16)
                recs_ref[:, pl.ds(idx, 16), :] = jnp.stack(rows_, axis=1).astype(jnp.int16)

            return _chunk_compute(
                c, qm, refv, (H, qg, run), sink,
                C=C, B=B, G_=G_, rlen_v=rlen_v, qlen_v=qlen_v, ms_v=ms_v, W_v=W_v,
            )

        jax.lax.fori_loop(
            0, S, chunk_body,
            (ckpt_ref[:, 0, 0, :], ckpt_ref[:, 0, 1, :], ckpt_ref[:, 0, 2, :]),
        )

    sub16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)

    def walk_problem(p, _):
        msv = ms_ref[g, p]
        Wv = W_ref[g, p]

        def cond(carry):
            i, q, st, ins, dl, ia, cnt, dead, bnd, rr = carry
            return (i > c0_rows) & (dead == 0)

        def body(carry):
            i, q, st, ins, dl, ia, cnt, dead, bnd, rr = carry
            li = i - 1 - c0_rows
            c0_dp = (i - 1) & ~(C - 1)
            l = q + msv + Wv - c0_dp - 1
            j = i - 1 - c0_dp
            in_band = (l >= j) & (l < j + B) & (l >= 0) & (l < WN)
            slab_at = pl.multiple_of((li >> 4) << 4, 16)
            # narrow [16, 128] lane block around the walker (see _walk_kernel)
            lc = jnp.clip(l, 0, WN - 1)
            lane_blk = pl.multiple_of(jnp.minimum((lc >> 7) << 7, WN - 128), 128)
            slab = recs_ref[p, pl.ds(slab_at, 16), pl.ds(lane_blk, 128)].astype(jnp.int32)
            word = jnp.sum(jnp.where((sub16 == (li & 15)) & (lane128 == lc - lane_blk), slab, 0))
            word = jnp.where(in_band, word, 0) & 0xFFFF
            bits = word & 63
            runv = word >> 6
            bnd = bnd | ((bits & BOUNDARY) > 0).astype(jnp.int32)

            take_m = (st == 0) & ((bits & MATCH) > 0)
            take_i = ((st == 0) & ((bits & REF_GAP_MATRIX) > 0) & ~take_m) | (st == REF_GAP_MATRIX)
            take_d = ((st == 0) & ((bits & QRY_GAP_MATRIX) > 0) & ~take_m & ~take_i) | (st == QRY_GAP_MATRIX)
            new_dead = jnp.where((bits != 0) & (take_m | take_i | take_d), 0, 1)
            live = new_dead == 0

            emit_d = live & (take_m | take_i) & (dl > 0)
            emit_m = live & take_m & (ins > 0) & (dl == 0)
            do_emit = emit_d | emit_m
            row_e = jnp.where(emit_d, i, i - 1)
            word_e = jnp.where(emit_d, OP_D | (ia << 2) | (dl << 17), OP_M | (ins << 2))
            idx = jnp.minimum(cnt, K - 1)

            @pl.when(do_emit)
            def _emit():
                rows_ref[p, idx] = row_e
                words_ref[p, idx] = word_e

            cnt = cnt + do_emit.astype(jnp.int32)
            start_run = live & take_d & (dl == 0)
            new_ia = jnp.where(start_run, ins, jnp.where(emit_d, 0, ia))
            new_dl = jnp.where(live & take_d, dl + 1, jnp.where(emit_d, 0, dl))

            new_st = jnp.where(
                take_i,
                jnp.where((bits & REF_GAP_EXTEND) > 0, REF_GAP_MATRIX, 0),
                jnp.where(take_d, jnp.where((bits & QRY_GAP_EXTEND) > 0, QRY_GAP_MATRIX, 0), st),
            )
            L = jnp.where(take_m, jnp.minimum(jnp.maximum(runv, 1), i - c0_rows), 0)
            # remaining run past the window edge: consumed without record
            # reads by later windows' skip logic
            rr = jnp.where(live & take_m, jnp.maximum(runv, 1) - L, 0)
            di = jnp.where(take_m, L, jnp.where(take_d, 1, 0))
            dq = jnp.where(take_m, L, jnp.where(take_i, 1, 0))
            i = jnp.where(live, i - di, i)
            q = jnp.where(live, q - dq, q)
            ins = jnp.where(live, jnp.where(take_i, ins + 1, jnp.where(take_m | take_d, 0, ins)), ins)
            st = jnp.where(live, new_st, st)
            return i, q, st, ins, new_dl, new_ia, cnt, new_dead, bnd, rr

        i0 = st_ref[p, S_I]
        rr0 = st_ref[p, S_RUN]
        dead0 = st_ref[p, S_DEAD]
        # consume the carried diagonal run before any record read
        jump = jnp.where(dead0 == 0, jnp.minimum(rr0, jnp.maximum(i0 - c0_rows, 0)), 0)
        carry0 = (
            i0 - jump, st_ref[p, S_Q] - jump, st_ref[p, S_STATE], st_ref[p, S_INS],
            st_ref[p, S_DEL], st_ref[p, S_IA], st_ref[p, S_CNT], dead0, st_ref[p, S_BND],
            rr0 - jump,
        )
        i, q, st, ins, dl, ia, cnt, dead, bnd, rr = jax.lax.while_loop(cond, body, carry0)
        st_ref[p, S_I] = i
        st_ref[p, S_Q] = q
        st_ref[p, S_STATE] = st
        st_ref[p, S_INS] = ins
        st_ref[p, S_DEL] = dl
        st_ref[p, S_IA] = ia
        st_ref[p, S_CNT] = cnt
        st_ref[p, S_DEAD] = dead
        st_ref[p, S_BND] = bnd
        st_ref[p, S_RUN] = rr
        return 0

    @pl.when(need_window > 0)
    def _walk():
        jax.lax.fori_loop(0, G_, walk_problem, 0)

    # epilogue runs every window (skipped or walked) so the outputs reflect
    # the final state after the last grid step
    for p in range(G_):
        i_p = st_ref[p, S_I]
        dead_p = st_ref[p, S_DEAD]
        dl_p = st_ref[p, S_DEL]
        cnt_p = st_ref[p, S_CNT]
        flush = (w == 0) & (i_p == 0) & (dead_p == 0) & (dl_p > 0)

        @pl.when(flush)
        def _flush(p=p, cnt_p=cnt_p, dl_p=dl_p):
            idx = jnp.minimum(cnt_p, K - 1)
            rows_ref[p, idx] = 0
            words_ref[p, idx] = OP_D | (st_ref[p, S_IA] << 2) | (dl_p << 17)
            st_ref[p, S_CNT] = cnt_p + 1

        nev_ref[p, 0] = st_ref[p, S_CNT]
        meta_ref[p, 0] = st_ref[p, S_Q]
        meta_ref[p, 1] = dead_p | jnp.where(i_p > 0, 1, 0).astype(jnp.int32)
        meta_ref[p, 2] = st_ref[p, S_BND]
        meta_ref[p, 3] = st_ref[p, S_INS]


def walk_ckpt(ckpt, ref_mask, qsh_pad, rlen, qlen, ms, W,
              R_cap: int, B: int, S: int, K: int, n_qb: int, g_size: int = 8):
    """Traceback over checkpointed DP -> compact event lists (same contract
    as walk_v2). qsh_pad must be padded to R_cap + (n_qb-1)*WV columns. The
    walk group may differ from the DP group, so the per-group row bound is
    recomputed here."""
    C = DP_C
    WN = B + C
    WV = S * C
    m = ckpt.shape[0]
    n_windows = R_cap // WV
    assert qsh_pad.shape[1] == R_cap + (n_qb - 1) * WV
    n_groups = m // g_size
    gmax = jnp.max(rlen.reshape(n_groups, g_size), axis=1).astype(jnp.int32)
    grid = (n_groups, n_windows)

    def smem():
        return pl.BlockSpec(memory_space=pltpu.SMEM)

    def qspec(t):
        return pl.BlockSpec(
            (g_size, WV), lambda g, wr, t=t: (g, n_windows - 1 - wr + t), memory_space=pltpu.VMEM
        )

    rows, words, nev, meta = pl.pallas_call(
        functools.partial(
            _walk_ckpt_kernel, C=C, B=B, G_=g_size, S=S, K=K, n_windows=n_windows, n_qb=n_qb
        ),
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            smem(), smem(), smem(), smem(), smem(),
            pl.BlockSpec(
                (g_size, 1, 3, WN),
                lambda g, wr: (g, n_windows - 1 - wr, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # the NEXT window's start carry (= this window's end row): its
            # uncapped run plane refreshes walker jump budgets. Clamped at
            # the last window; the kernel gates on w < n_windows - 1.
            pl.BlockSpec(
                (g_size, 1, 3, WN),
                lambda g, wr: (g, jnp.minimum(n_windows - wr, n_windows - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((g_size, WV), lambda g, wr: (g, n_windows - 1 - wr), memory_space=pltpu.VMEM),
        ]
        + [qspec(t) for t in range(n_qb)],
        out_specs=[
            pl.BlockSpec((g_size, K), lambda g, wr: (g, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g_size, K), lambda g, wr: (g, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g_size, 1), lambda g, wr: (g, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g_size, 4), lambda g, wr: (g, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, K), jnp.int32),
            jax.ShapeDtypeStruct((m, K), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((m, 4), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g_size, WV, WN), jnp.int16),
            pltpu.SMEM((g_size, 16), jnp.int32),
        ],
    )(
        rlen.reshape(n_groups, g_size),
        qlen.reshape(n_groups, g_size),
        ms.reshape(n_groups, g_size),
        W.reshape(n_groups, g_size),
        gmax.reshape(n_groups, 1),
        ckpt,
        ckpt,
        ref_mask,
        *([qsh_pad] * n_qb),
    )
    return rows, words, nev.reshape(m), meta


def ckpt_layout(B: int, g_w: int = 8):
    """(window_rows, n_query_blocks) for the checkpoint walk: the re-derived
    record window [g_w, WV, B+DP_C] int16 must fit in an 8 MB VMEM budget; WV
    is a power of two x 128 (so it divides every R_cap tier) and n_qb
    WV-blocks of the padded query cover any chunk's B+DP_C window. The walk
    group is fixed at 8 (Mosaic block-shape constraint: sublane dim % 8).
    Raises ValueError when even the minimum window (WV=DP_C) exceeds the
    budget — callers must route such bands to the host aligner."""
    C = DP_C
    WN = B + C
    budget = 8 * 1024 * 1024
    wv = 2048
    while wv > C and g_w * wv * WN * 2 > budget:
        wv //= 2
    if g_w * wv * WN * 2 > budget:
        raise ValueError(f"ckpt walk window for B={B} exceeds VMEM budget even at WV={wv}")
    n_qb = 1 + -(-B // wv)  # ceil
    return wv, n_qb


def _ckpt_from_masks(ref_mask, qry_mask, rlen, qlen, ms, W, gmax,
                     R_cap: int, B: int, K: int, S: int, n_qb: int, g_size: int):
    m, Wq = qry_mask.shape
    assert Wq == R_cap + B
    WV = S * DP_C
    shift = ms + W
    t = jnp.arange(Wq, dtype=jnp.int32)[None, :]
    rolled = jax.vmap(lambda row, s: jnp.roll(row, s))(qry_mask, shift)
    valid = (t >= shift[:, None]) & (t < shift[:, None] + qlen[:, None])
    qsh = jnp.where(valid, rolled, 0).astype(jnp.uint8)
    qsh_pad = jnp.pad(qsh, ((0, 0), (0, (n_qb - 1) * WV - B)))

    ckpt = stripe_dp_ckpt(ref_mask, qsh_pad[:, : R_cap + B], rlen, qlen, ms, W, gmax, R_cap, B, S, g_size)
    rows, words, n_events, meta = walk_ckpt(
        ckpt, ref_mask, qsh_pad, rlen, qlen, ms, W, R_cap, B, S, K, n_qb, g_size=8
    )
    return {"rows": rows, "words": words, "n_events": n_events, "meta": meta}


@functools.partial(jax.jit, static_argnames=("R_cap", "B", "K", "S", "n_qb", "g_size"))
def stripe_align_v2_ckpt(ref_seq, qry_seq, rlen, qlen, ms, W, gmax,
                         R_cap: int, B: int, K: int, S: int, n_qb: int, g_size: int = G):
    """Checkpointed device pipeline for Mbp-scale problems: DP checkpoint
    pass (no path records in HBM) + window re-derive walk. Output contract
    identical to stripe_align_v2."""
    from pangraph_tpu.graph.seq import IUPAC_MASK

    iupac = jnp.asarray(IUPAC_MASK)
    ref_mask = jnp.take(iupac, ref_seq.astype(jnp.int32), mode="clip").astype(jnp.int32)
    qry_mask = jnp.take(iupac, qry_seq.astype(jnp.int32), mode="clip")
    return _ckpt_from_masks(ref_mask, qry_mask, rlen, qlen, ms, W, gmax, R_cap, B, K, S, n_qb, g_size)


@functools.partial(jax.jit, static_argnames=("R_cap", "B", "K", "S", "n_qb", "g_size"))
def stripe_align_v2_ckpt_packed(ref_packed, qry_packed, rlen, qlen, ms, W, gmax,
                                R_cap: int, B: int, K: int, S: int, n_qb: int, g_size: int = G):
    """stripe_align_v2_ckpt with nibble-packed inputs (see
    stripe_align_v2_packed) — halves the H2D transfer of Mbp-scale jobs."""
    ref_mask = _unpack_nibbles(ref_packed).astype(jnp.int32)
    qry_mask = _unpack_nibbles(qry_packed)
    return _ckpt_from_masks(ref_mask, qry_mask, rlen, qlen, ms, W, gmax, R_cap, B, K, S, n_qb, g_size)


def _v2_from_masks(ref_mask, qry_mask, rlen, qlen, ms, W, gmax, R_cap: int, B: int, K: int, g_size: int):
    """Shared tail of the v2 pipeline once IUPAC masks exist on device:
    pre-shift the query, run the DP and the run-jump walk."""
    m, Wq = qry_mask.shape
    assert Wq == R_cap + B
    shift = ms + W
    t = jnp.arange(Wq, dtype=jnp.int32)[None, :]
    rolled = jax.vmap(lambda row, s: jnp.roll(row, s))(qry_mask, shift)
    valid = (t >= shift[:, None]) & (t < shift[:, None] + qlen[:, None])
    qsh = jnp.where(valid, rolled, 0).astype(jnp.uint8)

    paths = stripe_dp_v2(ref_mask, qsh, rlen, qlen, ms, W, gmax, R_cap, B, g_size)
    rows, words, n_events, meta = walk_v2(paths, rlen, qlen, ms, W, R_cap, B, K)
    return {"rows": rows, "words": words, "n_events": n_events, "meta": meta}


def _unpack_nibbles(packed):
    """[m, L/2] uint8 (two 4-bit IUPAC masks per byte, high nibble first)
    -> [m, L] uint8 masks."""
    hi = (packed >> 4).astype(jnp.uint8)
    lo = (packed & jnp.uint8(15)).astype(jnp.uint8)
    m, half = packed.shape
    return jnp.stack([hi, lo], axis=-1).reshape(m, half * 2)


@functools.partial(jax.jit, static_argnames=("R_cap", "B", "K", "g_size"))
def stripe_align_v2(ref_seq, qry_seq, rlen, qlen, ms, W, gmax, R_cap: int, B: int, K: int = 512, g_size: int = G):
    """Full device pipeline: DP -> run-jump walk with direct event emission.

    ref_seq [m, R_cap] uint8, qry_seq [m, R_cap + 2B] uint8 (raw bytes; IUPAC
    masks and the pre-shifted query are derived on device). Returns dict with
    rows/words [m, K], n_events [m], meta [m, 4] (lead, dead, bnd, pend_ins).
    Event counts > K are flagged via n_events (host retries those jobs)."""
    from pangraph_tpu.graph.seq import IUPAC_MASK

    iupac = jnp.asarray(IUPAC_MASK)
    ref_mask = jnp.take(iupac, ref_seq.astype(jnp.int32), mode="clip").astype(jnp.int32)
    qry_mask = jnp.take(iupac, qry_seq.astype(jnp.int32), mode="clip")
    return _v2_from_masks(ref_mask, qry_mask, rlen, qlen, ms, W, gmax, R_cap, B, K, g_size)


@functools.partial(jax.jit, static_argnames=("R_cap", "B", "K", "g_size"))
def stripe_align_v2_packed(ref_packed, qry_packed, rlen, qlen, ms, W, gmax,
                           R_cap: int, B: int, K: int = 512, g_size: int = G):
    """stripe_align_v2 with nibble-packed inputs: the host packs two 4-bit
    IUPAC masks per byte (pack_nibbles_host), HALVING the H2D transfer —
    on bandwidth-degraded links input transfer dominates the per-round
    device cost. Output-identical to the raw-byte wrapper."""
    ref_mask = _unpack_nibbles(ref_packed).astype(jnp.int32)
    qry_mask = _unpack_nibbles(qry_packed)
    return _v2_from_masks(ref_mask, qry_mask, rlen, qlen, ms, W, gmax, R_cap, B, K, g_size)


def pack_nibbles_host(codes: "np.ndarray") -> "np.ndarray":
    """[m, L] uint8 IUPAC masks (values 0-15, L even) -> [m, L/2] uint8,
    high nibble first (numpy, host side)."""
    assert codes.shape[1] % 2 == 0
    return (codes[:, 0::2] << 4 | codes[:, 1::2]).astype(np.uint8)


def edit_from_events(rows, words, n_events, meta, ref: np.ndarray, qry: np.ndarray):
    """Host decode: run-compressed event list -> Edit, fully vectorized.

    Conventions (edits.rs, map_variations.rs:70-73): Sub.pos / Del.pos are
    0-based reference positions; Ins.pos is the reference position *after*
    which the insertion sits. Event word layout (see _walk_kernel): op in
    bits 0-1; insertion-run length in bits 2-16; deletion-run length in bits
    17-31. An OP_D event at row x deletes ref[x .. x+del_len) and inserts
    ins_len query chars at position x+del_len; an OP_M event at row x is a
    diagonal move with ins_len chars inserted at x+1. Rows not covered by
    events are implicit diagonal moves (substitutions recovered by compare).
    Returns (edit, ok) — ok False when the walk died or events overflowed."""
    from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub

    K = rows.shape[0]
    lead, dead, _bnd, pend_ins = int(meta[0]), int(meta[1]), int(meta[2]), int(meta[3])
    n = int(n_events)
    if dead or n > K:
        return None, False
    rlen, qlen = len(ref), len(qry)
    q0 = lead + pend_ins  # query chars consumed before any ref row

    if n == 0:
        if q0 + rlen != qlen:
            return None, False
        d = np.nonzero(ref != qry[q0:])[0]
        subs = [Sub(int(i), chr(int(qry[q0 + i]))) for i in d]
        inss = [Ins(0, bytes(qry[:q0]).decode())] if q0 else []
        return Edit(subs=subs, dels=[], inss=inss), True

    # events arrive in walk order (descending row); flip to forward order
    xs = rows[:n][::-1].astype(np.int64)
    ws = words[:n][::-1].astype(np.int64)
    ops = ws & 3
    ins_len = (ws >> 2) & 0x7FFF
    del_len = ws >> 17
    is_d = ops == OP_D
    dlen = np.where(is_d, del_len, 0)

    # deleted-row mask via run difference array; insertion chars attach after
    # the event's last consumed ref row (before ref position `attach`)
    dmark = np.zeros(rlen + 2, dtype=np.int64)
    np.add.at(dmark, xs[is_d], 1)
    np.add.at(dmark, xs[is_d] + dlen[is_d], -1)
    del_mask = np.cumsum(dmark[: rlen + 1]) > 0
    attach = np.where(is_d, xs + dlen, xs + 1)
    ins_at = np.zeros(rlen + 1, dtype=np.int64)
    np.add.at(ins_at, attach, ins_len)
    nd_excl = np.zeros(rlen + 1, dtype=np.int64)
    np.cumsum(del_mask[:rlen], out=nd_excl[1:])  # deletions strictly before i
    ins_cum = np.cumsum(ins_at)  # ins chars attached at indices <= i
    if q0 + (rlen - nd_excl[rlen]) + ins_cum[rlen] != qlen:
        return None, False

    # substitutions: every non-deleted ref position i aligns to query position
    # q0 + (#non-deleted ref < i) + (#ins chars attached at indices <= i)
    idx = np.arange(rlen, dtype=np.int64)
    q_of = q0 + (idx - nd_excl[:rlen]) + ins_cum[:rlen]
    mi = np.nonzero(~del_mask[:rlen])[0]
    dif = mi[ref[mi] != qry[q_of[mi]]]
    subs = [Sub(int(i), chr(int(qry[q_of[i]]))) for i in dif]

    # deletions: one Del per OP_D event (runs are maximal by construction —
    # an insertion between two runs keeps them separate entries)
    di = np.nonzero(is_d)[0]
    dels = [Del(int(xs[t]), int(dlen[t])) for t in di]

    # insertions: event inserts qry[q_op : q_op+ins_len] at ref position
    # `attach`, where q_op = query consumed through the event's op
    inss = [Ins(0, bytes(qry[:q0]).decode())] if q0 else []
    it = np.nonzero(ins_len > 0)[0]
    if len(it):
        a_it = attach[it]
        q_op = q0 + (a_it - nd_excl[a_it]) + (ins_cum[a_it] - ins_len[it])
        for t, av, qs in zip(it, a_it, q_op):
            inss.append(Ins(int(av), bytes(qry[int(qs) : int(qs) + int(ins_len[t])]).decode()))
    return Edit(subs=subs, dels=dels, inss=inss), True
