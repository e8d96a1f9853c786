"""Pallas TPU kernel for the banded stripe DP (K3, speed-of-light path).

Design (see /opt/skills/guides/pallas_guide.md):

- **pure diagonal band**: row i covers query columns [i - ms - W, i - ms - W + B).
  The band marches one column right per row (shift == 1 always), so the carry
  needs no realignment beyond a single lane roll for the vertical move. The
  driver guarantees the end corner lies in the band by widening W before
  dispatch (|qlen - rlen + ms| <= W), replacing the clamped-band corner drag.
- **pre-shifted query**: the driver materializes qsh[g, t] = qry_mask[g, t - ms_g - W],
  so every problem of a group reads the same slice
  qsh[:, r : r+B] for chunk-local row r — a uniform VMEM window, no gathers.
- **layout**: G=8 problems on sublanes x B=128 band on lanes. Every row update
  is ~25 (8,128) VPU ops incl. a 7-step lane-shift prefix max.
- **grid**: (groups, row chunks); TPU grid steps run sequentially per core, so
  the DP carry lives in VMEM scratch across chunk steps (init at chunk 0).
  Traceback bits stream to HBM [groups*G, R_cap, B]; the on-device traceback
  of ops/stripe_fused consumes them inside the same jit.
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

G = 8  # problems per group (sublane tile)


def _lane_prefix_max_exclusive(x, B):
    """Exclusive running max along the lane axis of [G, B] int32:
    out[:, k] = max(x[:, :k]), out[:, 0] = NO_ALIGN."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, B), 1)
    # shift right by one with NO_ALIGN fill
    y = pltpu.roll(x, 1, axis=1)
    y = jnp.where(lane >= 1, y, NO_ALIGN)
    s = 1
    while s < B:
        z = pltpu.roll(y, s, axis=1)
        z = jnp.where(lane >= s + 1, z, NO_ALIGN)
        y = jnp.maximum(y, z)
        s *= 2
    return y


def _stripe_kernel(
    rlen_ref, qlen_ref, ms_ref, W_ref, gmax_ref,  # per-group scalars [G] / [1]
    ref_chunk_ref, qsh_a_ref, qsh_b_ref,  # [G, C], [G, C], [G, C] (adjacent chunks)
    paths_ref,  # out [G, C, B] int8
    H_ref, qg_ref,  # scratch [G, B] int32
    *, C: int, B: int,
):
    g = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    def vec8(ref):
        # SMEM scalars -> [G, 1] vector for broadcasting against [G, B]
        sub = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        v = jnp.zeros((G, 1), jnp.int32)
        for j in range(G):
            v = jnp.where(sub == j, ref[g, j], v)
        return v

    rlen_v = vec8(rlen_ref)  # [G, 1]
    qlen_v = vec8(qlen_ref)
    ms_v = vec8(ms_ref)
    W_v = vec8(W_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, B), 1)
    edge_hi = lane == B - 1
    edge_lo = lane == 0
    base = -ms_v - W_v  # [G, 1]; lo_i = i + base

    @pl.when(c == 0)
    def _init():
        # row 0: free leading insertion across the band
        qpos0 = base + lane
        H_ref[:] = jnp.where((qpos0 >= 0) & (qpos0 <= qlen_v), 0, NO_ALIGN)
        qg_ref[:] = jnp.full((G, B), NO_ALIGN, dtype=jnp.int32)

    group_max = gmax_ref[g, 0]

    @pl.when(c * C < group_max)
    def _compute():
        # query window source: this chunk + the next (window r..r+B, B <= C).
        # Per-row access uses a dynamic lane rotate + static slice — unaligned
        # dynamic lane offsets are not loadable on TPU.
        qwin_val = jnp.concatenate(
            [qsh_a_ref[:].astype(jnp.int32), qsh_b_ref[:].astype(jnp.int32)], axis=1
        )  # [G, 2C]
        ref_val = ref_chunk_ref[:].astype(jnp.int32)  # [G, C]

        KR = 32  # rows per aligned output store (int8 sublane tile)

        def row_body(r, carry):
            H_prev, qgap, acc = carry
            i = c * C + r + 1
            qpos = base + lane + i
            in_matrix = (qpos >= 0) & (qpos <= qlen_v) & (i <= rlen_v)

            # vertical (up) cells come from prev band index k+1
            H_up = pltpu.roll(H_prev, B - 1, axis=1)
            H_up = jnp.where(edge_hi, NO_ALIGN, H_up)
            qg_up = pltpu.roll(qgap, B - 1, axis=1)
            qg_up = jnp.where(edge_hi, NO_ALIGN, qg_up)
            # diagonal cells share the same band index k
            H_diag = H_prev

            valid_prev = qpos - 1 >= 0  # prev-row band bound (same k, row above)
            diag_valid = valid_prev & (qpos >= 1) & in_matrix
            up_valid = ~edge_hi & (qpos >= 1) & in_matrix

            # rotate left by r, then take a static prefix slice
            rm = pltpu.roll(ref_val, (C - r) % C, axis=1)[:, :1]  # [G,1]
            qm = pltpu.roll(qwin_val, (2 * C - r) % (2 * C), axis=1)[:, :B]  # [G,B]
            unknown = (rm == 15) | (qm == 15)
            compat = (rm & qm) > 0
            msub = jnp.where(unknown, SCORE_MATCH - 1, jnp.where(compat, SCORE_MATCH, -PENALTY_MISMATCH))
            M = jnp.where(diag_valid, H_diag + msub, NO_ALIGN)
            interior = (qpos >= 1) & (i < rlen_v) & (qpos < qlen_v) & in_matrix
            path = jnp.where(~diag_valid & interior, BOUNDARY, 0)

            q_free = qpos == qlen_v
            q_open_val = jnp.where(q_free, H_up, H_up - GAP_OPEN)
            q_ext_allowed = (qg_up >= q_open_val) & (lane < B - 2)
            QG = jnp.where(up_valid, jnp.where(q_ext_allowed, qg_up, q_open_val), NO_ALIGN)
            path = path | jnp.where(up_valid & q_ext_allowed, QRY_GAP_EXTEND, 0)
            path = path | jnp.where(~up_valid & interior, BOUNDARY, 0)
            new_qgap = jnp.where(up_valid, QG, NO_ALIGN)

            first_col = (qpos == 0) & in_matrix
            M = jnp.where(first_col, 0, M)
            NQ = jnp.maximum(M, QG)

            gap_cost = jnp.where(i == rlen_v, 0, GAP_OPEN)
            Gv = _lane_prefix_max_exclusive(NQ - gap_cost, B)
            Gv = jnp.where(edge_lo, NO_ALIGN, Gv)
            path = path | jnp.where(edge_lo & interior, BOUNDARY, 0)
            prevG = pltpu.roll(Gv, 1, axis=1)
            prevG = jnp.where(edge_lo, NO_ALIGN, prevG)
            Hm1 = jnp.maximum(NQ, Gv)
            r_open_prev = pltpu.roll(Hm1 - gap_cost, 1, axis=1)
            r_open_prev = jnp.where(edge_lo, NO_ALIGN, r_open_prev)
            r_ext = (prevG >= r_open_prev) & (lane > 1)
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

            live = i <= rlen_v
            H_out = jnp.where(live, H, H_prev)
            qg_out = jnp.where(live, new_qgap, qgap)
            # rolling accumulator: append this row, drop the oldest (static
            # slices only — dynamic row stores are not lane/sublane-alignable)
            acc = jnp.concatenate([acc[:, 1:, :], path.astype(jnp.int8)[:, None, :]], axis=1)
            return H_out, qg_out, acc

        def block_body(rg, carry):
            H_prev, qgap = carry
            acc0 = jnp.zeros((G, KR, B), dtype=jnp.int8)
            H_prev, qgap, acc = jax.lax.fori_loop(
                rg * KR, rg * KR + KR, row_body, (H_prev, qgap, acc0)
            )
            idx = pl.multiple_of(rg * KR, KR)
            paths_ref[:, pl.ds(idx, KR), :] = acc
            return H_prev, qgap

        H_fin, qg_fin = jax.lax.fori_loop(0, C // KR, block_body, (H_ref[:], qg_ref[:]))
        H_ref[:] = H_fin
        qg_ref[:] = qg_fin

    @pl.when(c * C >= group_max)
    def _skip():
        paths_ref[:] = jnp.zeros((G, C, B), dtype=jnp.int8)


@functools.partial(jax.jit, static_argnames=("R_cap", "B", "C", "MAX_SUBS", "MAX_DELS", "MAX_INS"))
def stripe_align_pallas(
    ref_seq, qry_seq, rlen, qlen, ms, W, gmax,
    R_cap: int, B: int, C: int = 256, MAX_SUBS: int = 8192, MAX_DELS: int = 4096, MAX_INS: int = 4096,
):
    """Pallas DP + Pallas traceback + vectorized edit-list decode, one jit.

    Only raw uint8 sequences cross the host boundary; IUPAC masks and the
    pre-shifted query buffer are computed on device (halves H2D traffic).
    ref_seq [m, R_cap]; qry_seq [m, R_cap + C]. Returns compact per-problem
    edit lists (see traceback_pallas.decode_records)."""
    from pangraph_tpu.graph.seq import IUPAC_MASK
    from pangraph_tpu.ops.traceback_pallas import traceback_lists

    m, Wq = qry_seq.shape
    iupac = jnp.asarray(IUPAC_MASK)
    ref_mask = jnp.take(iupac, ref_seq.astype(jnp.int32), mode="clip")
    qry_mask = jnp.take(iupac, qry_seq.astype(jnp.int32), mode="clip")
    # qsh[t] = qry_mask[t - ms - W], zeros outside [shift, shift + qlen)
    shift = ms + W  # [m]
    t = jnp.arange(Wq, dtype=jnp.int32)[None, :]
    rolled = jax.vmap(lambda row, s: jnp.roll(row, s))(qry_mask, shift)
    valid = (t >= shift[:, None]) & (t < shift[:, None] + qlen[:, None])
    qsh_mask = jnp.where(valid, rolled, 0).astype(jnp.uint8)

    paths = stripe_dp_pallas(ref_mask, qsh_mask, rlen, qlen, ms, W, gmax, R_cap, B, C)
    return traceback_lists(
        paths, ref_seq, qry_seq, rlen, qlen, ms, W, R_cap, B, MAX_SUBS, MAX_DELS, MAX_INS
    )


def stripe_dp_pallas(ref_mask, qsh_mask, rlen, qlen, ms, W, gmax, R_cap: int, B: int, C: int = 256):
    """Run the Pallas DP over [n_problems, ...] inputs grouped in G-problem
    tiles. Returns paths [n_problems, R_cap, B] int8 (rows 1..R_cap).

    ref_mask [N, R_cap]; qsh_mask [N, R_cap + C] pre-shifted (extra C columns
    of padding so the chunk-lookahead block exists); scalars [N]; gmax
    [N/G] per-group max rlen."""
    n = ref_mask.shape[0]
    assert n % G == 0
    assert R_cap % C == 0 and B <= C
    assert qsh_mask.shape[1] == R_cap + C
    n_groups = n // G
    n_chunks = R_cap // C
    grid = (n_groups, n_chunks)

    def scalar_spec():
        # full-array SMEM refs indexed by program_id(0) inside the kernel
        return pl.BlockSpec(memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_stripe_kernel, C=C, B=B),
        grid=grid,
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
        in_specs=[
            scalar_spec(),  # rlen
            scalar_spec(),  # qlen
            scalar_spec(),  # ms
            scalar_spec(),  # W
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gmax
            pl.BlockSpec((G, C), lambda g, c: (g, c), memory_space=pltpu.VMEM),  # ref chunk
            # pre-shifted query: current chunk + lookahead chunk
            pl.BlockSpec((G, C), lambda g, c: (g, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, C), lambda g, c: (g, c + 1), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, C, B), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, R_cap, B), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((G, B), jnp.int32),
            pltpu.VMEM((G, B), jnp.int32),
        ],
    )(
        rlen.reshape(n_groups, G),
        qlen.reshape(n_groups, G),
        ms.reshape(n_groups, G),
        W.reshape(n_groups, G),
        gmax.reshape(n_groups, 1),
        ref_mask,
        qsh_mask,
        qsh_mask,
    )
    return out
