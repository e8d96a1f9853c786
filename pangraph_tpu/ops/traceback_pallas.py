"""Pallas TPU traceback for the banded stripe DP.

The DP kernel (stripe_pallas) streams per-cell origin bits to HBM as
paths [m, R_cap, B] int8. Recovering the alignment is an inherently
sequential walk (~rlen+qlen moves). Doing that walk as an XLA while_loop
costs ~8 us per move (every move is a tiny gather + dynamic-update dispatch);
for Mbp-scale blocks the traceback then dwarfs the DP itself. Here the walk
runs inside a Pallas kernel at register speed:

- grid (problems, chunks) with the chunk axis REVERSED: the walk starts at
  row rlen and marches down; each grid step walks the C rows of one
  paths chunk held in VMEM (auto-pipelined HBM prefetch).
- per move: dynamic-sublane load of the band row, lane extraction by
  iota-compare + reduce, scalar state update. Walk state (i, q, gap-state,
  pending-insertion count, flags) persists across chunk steps in SMEM.
- instead of RLE ops, the kernel emits one packed int32 per DP row:
  op(M/D) | ins_run_after_row << 2. A vectorized decode pass (plain XLA,
  fully parallel) then turns the row records into compact substitution /
  deletion / insertion lists via cumsum + scatter stream compaction.

This mirrors the roles in the reference: ksw2 produces a CIGAR, the edits
are derived from it (align/map_variations.rs:39-77) — here the "CIGAR" is
the row-record array and the edit extraction is data-parallel on device.
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

OP_M = 1
OP_D = 2

# SMEM walk-state slots
S_I, S_Q, S_STATE, S_INS, S_DEAD, S_BND = 0, 1, 2, 3, 4, 5


C_TB = 1024  # DP rows walked per grid step (one [8, 128]-tiled record block)


def _tb_kernel(rlen_ref, qlen_ref, ms_ref, W_ref, paths_ref, rec_ref, meta_ref, st_ref, *, B: int):
    g = pl.program_id(0)
    c_rev = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    chunk = n_chunks - 1 - c_rev
    c0 = chunk * C_TB  # this grid step walks DP rows (c0, c0 + C_TB]

    @pl.when(c_rev == 0)
    def _init():
        st_ref[S_I] = rlen_ref[g]
        st_ref[S_Q] = qlen_ref[g]
        st_ref[S_STATE] = 0
        st_ref[S_INS] = 0
        st_ref[S_DEAD] = 0
        st_ref[S_BND] = 0

    msv = ms_ref[g]
    Wv = W_ref[g]
    subB = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
    laneB = jax.lax.broadcasted_iota(jnp.int32, (8, B), 1)
    # record tile [8, 128]: local row li -> (sublane li // 128, lane li % 128)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    rec0 = jnp.zeros((8, 128), jnp.int32)

    def cond(carry):
        i, q, st, ins, dead, bnd, rec = carry
        return (i > c0) & (dead == 0)

    def body(carry):
        i, q, st, ins, dead, bnd, rec = carry
        k = q - (i - msv - Wv)
        li = i - 1 - c0
        in_band = (k >= 0) & (k < B)
        # dynamic sublane loads of int8 must be 8-aligned: load the 8-row
        # slab containing li, then mask-reduce out the (row, lane) element.
        # (The walk is HBM-bound on the paths stream, so per-move vector
        # work is not the limiter — keep it simple.)
        slab_at = pl.multiple_of((li >> 3) << 3, 8)
        slab = paths_ref[0, pl.ds(slab_at, 8), :].astype(jnp.int32)  # [8, B]
        bits = jnp.sum(jnp.where((subB == (li & 7)) & (laneB == k), slab, 0))
        bits = jnp.where(in_band, bits, 0)
        bnd = bnd | ((bits & BOUNDARY) > 0).astype(jnp.int32)

        take_m = (st == 0) & ((bits & MATCH) > 0)
        take_i = ((st == 0) & ((bits & REF_GAP_MATRIX) > 0) & ~take_m) | (st == REF_GAP_MATRIX)
        take_d = ((st == 0) & ((bits & QRY_GAP_MATRIX) > 0) & ~take_m & ~take_i) | (st == QRY_GAP_MATRIX)
        new_dead = jnp.where((bits != 0) & (take_m | take_i | take_d), 0, 1)
        live = new_dead == 0

        exit_row = (take_m | take_d) & live  # row i's forward move found
        opv = jnp.where(take_m, OP_M, OP_D) | (ins << 2)
        hit = exit_row & (sub8 == (li >> 7)) & (lane128 == (li & 127))
        rec = jnp.where(hit, opv, rec)

        new_st = jnp.where(
            take_i,
            jnp.where((bits & REF_GAP_EXTEND) > 0, REF_GAP_MATRIX, 0),
            jnp.where(take_d, jnp.where((bits & QRY_GAP_EXTEND) > 0, QRY_GAP_MATRIX, 0), st),
        )
        di = jnp.where(take_m | take_d, 1, 0)
        dq = jnp.where(take_m | take_i, 1, 0)
        i = jnp.where(live, i - di, i)
        q = jnp.where(live, q - dq, q)
        ins = jnp.where(live, jnp.where(take_i, ins + 1, jnp.where(exit_row, 0, ins)), ins)
        st = jnp.where(live, new_st, st)
        return i, q, st, ins, new_dead, bnd, rec

    carry = (st_ref[S_I], st_ref[S_Q], st_ref[S_STATE], st_ref[S_INS], st_ref[S_DEAD], st_ref[S_BND], rec0)
    i, q, st, ins, dead, bnd, rec = jax.lax.while_loop(cond, body, carry)

    st_ref[S_I] = i
    st_ref[S_Q] = q
    st_ref[S_STATE] = st
    st_ref[S_INS] = ins
    st_ref[S_DEAD] = dead
    st_ref[S_BND] = bnd

    rec_ref[0] = rec
    # meta is overwritten every chunk step; the final (chunk 0) values win
    meta_ref[g, 0] = q  # lead insertion length once i reaches 0
    meta_ref[g, 1] = dead | jnp.where(i > 0, 1, 0).astype(jnp.int32)
    meta_ref[g, 2] = bnd


def traceback_records(paths, rlen, qlen, ms, W, R_cap: int, B: int):
    """Walk all problems' tracebacks. Returns (rec [m, R_cap] int32 packed
    row records, meta [m, 3] int32: lead, dead, boundary)."""
    m = paths.shape[0]
    assert R_cap % C_TB == 0
    n_chunks = R_cap // C_TB
    grid = (m, n_chunks)

    rec, meta = pl.pallas_call(
        functools.partial(_tb_kernel, B=B),
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rlen
            pl.BlockSpec(memory_space=pltpu.SMEM),  # qlen
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ms
            pl.BlockSpec(memory_space=pltpu.SMEM),  # W
            pl.BlockSpec((1, C_TB, B), lambda g, c: (g, n_chunks - 1 - c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda g, c: (g, n_chunks - 1 - c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, R_cap // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((m, 3), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
    )(rlen, qlen, ms, W, paths)
    return rec.reshape(m, R_cap), meta


def decode_records(rec, meta, ref_seq, qry_seq, rlen, qlen, MAX_SUBS: int, MAX_DELS: int, MAX_INS: int):
    """Vectorized row-record -> edit-list decode (stream compaction).

    Forward-order semantics per DP row i (1-based; rec index i-1):
    op M consumes ref[i-1] + one qry char; op D consumes ref[i-1] only;
    ins_run chars follow row i's move (Ins.pos == i, the
    position-after-insertion convention of map_variations.rs:70-73)."""
    m, R_cap = rec.shape
    rows = jnp.arange(R_cap, dtype=jnp.int32)[None, :]
    lead = meta[:, 0:1]
    dead = meta[:, 1]
    valid = rows < rlen[:, None]
    op = jnp.where(valid, rec & 3, 0)
    ins_len = jnp.where(valid, rec >> 2, 0)
    is_M = op == OP_M
    is_D = op == OP_D

    consumed = is_M.astype(jnp.int32) + ins_len
    q_excl = lead + jnp.cumsum(consumed, axis=1) - consumed  # exclusive prefix

    # substitutions: M rows whose qry char differs from ref
    Wq = qry_seq.shape[1]
    qc = jnp.take_along_axis(qry_seq, jnp.clip(q_excl, 0, Wq - 1), axis=1)
    rc = ref_seq[:, :R_cap]
    sub_flag = is_M & (qc != rc)
    n_subs = jnp.sum(sub_flag, axis=1)
    sub_idx = jnp.cumsum(sub_flag, axis=1) - 1
    sub_idx = jnp.where(sub_flag, sub_idx, MAX_SUBS)  # OOB -> dropped
    bi = jnp.arange(m, dtype=jnp.int32)[:, None]
    subs = jnp.zeros((m, MAX_SUBS, 2), jnp.int32)
    subs = subs.at[bi, sub_idx, 0].set(rows, mode="drop")
    subs = subs.at[bi, sub_idx, 1].set(qc.astype(jnp.int32), mode="drop")

    # deletions: RLE over D rows
    prev_D = jnp.pad(is_D, ((0, 0), (1, 0)))[:, :-1]
    d_start = is_D & ~prev_D
    n_dels = jnp.sum(d_start, axis=1)
    did = jnp.cumsum(d_start, axis=1) - 1
    did_s = jnp.where(d_start, did, MAX_DELS)
    dels = jnp.zeros((m, MAX_DELS, 2), jnp.int32)
    dels = dels.at[bi, did_s, 0].set(rows, mode="drop")  # pos = i - 1
    did_a = jnp.where(is_D, did, MAX_DELS)
    dels = dels.at[bi, did_a, 1].add(1, mode="drop")  # run length

    # insertions: rows with a trailing ins run (pos = i, chars qry[qstart:+len])
    ins_flag = valid & (ins_len > 0)
    n_inss = jnp.sum(ins_flag, axis=1)
    iid = jnp.cumsum(ins_flag, axis=1) - 1
    iid = jnp.where(ins_flag, iid, MAX_INS)
    qstart = q_excl + is_M.astype(jnp.int32)
    inss = jnp.zeros((m, MAX_INS, 3), jnp.int32)
    inss = inss.at[bi, iid, 0].set(rows + 1, mode="drop")
    inss = inss.at[bi, iid, 1].set(qstart, mode="drop")
    inss = inss.at[bi, iid, 2].set(ins_len, mode="drop")

    overflow = (
        (dead > 0)
        | (n_subs > MAX_SUBS)
        | (n_dels > MAX_DELS)
        | (n_inss > MAX_INS)
    )
    boundary = (meta[:, 2] > 0) | overflow
    out_meta = jnp.stack(
        [
            n_subs,
            n_dels,
            n_inss,
            meta[:, 0],
            boundary.astype(jnp.int32),
            overflow.astype(jnp.int32),
        ],
        axis=1,
    )
    return {"subs": subs, "dels": dels, "inss": inss, "meta": out_meta}


def traceback_lists(paths, ref_seq, qry_seq, rlen, qlen, ms, W, R_cap: int, B: int,
                    MAX_SUBS: int = 8192, MAX_DELS: int = 4096, MAX_INS: int = 4096):
    """Pallas walk + vectorized decode: paths -> compact edit lists."""
    rec, meta = traceback_records(paths, rlen, qlen, ms, W, R_cap, B)
    return decode_records(rec, meta, ref_seq, qry_seq, rlen, qlen, MAX_SUBS, MAX_DELS, MAX_INS)
