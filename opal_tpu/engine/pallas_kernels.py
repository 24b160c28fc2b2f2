"""Pallas TPU kernels: batched affine-gap DP scoring.

TPU-native re-design of the reference's SIMD column kernels
(reference: src/opal.cpp:164-470 SW, :594-977 NW/HW/OV). Design:

- **Lanes = database sequences.** A block of B (default 512) length-bucketed,
  padded DB sequences advances one DP column per step, exactly like the
  reference's 8-32 SIMD lanes but 16-64x wider. Host-side length bucketing
  replaces the reference's dynamic lane refill (hostile to static shapes).

- **Vectorized over the query too.** The reference updates one query row at a
  time; here the whole [Q, B] column updates at once. The in-column F chain
  F[r] = max(H[r-1]-Go, F[r-1]-Ge) is exact as a max-plus *prefix scan* over
  the F-independent part H' of H whenever Ge <= Go (the via-H candidate
  F[r-1]-Go is dominated by F[r-1]-Ge), computed in log2(Q) Hillis-Steele
  steps of sublane rolls on the VPU.

- **Ramped coordinates.** All DP state is stored *ramped*: H~ = H + r*Ge,
  E~ = E + r*Ge. In this space the prefix-scan input needs no per-column
  ramp add/remove (X_in[r] = H'~[r-1] + (Ge-Go) — a constant add), the
  diagonal candidate becomes roll(H~,1) + (P + Ge) with the +Ge baked into
  the query profile at prepare time, and the SW clamp-to-zero becomes a max
  with the constant ramp. Trackers compare ramped values directly (constant
  per-row offsets preserve order along t) and un-ramp once at emit.

- **Query profile via one-hot MXU matmul.** The per-column profile
  P[r, lane] = matrix[query[r], db_letter[lane]] is a gather the VPU can't
  do; instead P = QP @ onehot(letters) runs on the otherwise-idle MXU
  (QP[q, a] = matrix[query[q], a] + Ge in bf16 — exact for small integer
  scores). Only 1 byte/lane/column of letters streams from HBM (int8).

- **Padding is algebraic, not masked.** Padded columns and rows carry the
  reserved PAD_LETTER whose profile entries are -2^20, so DP values in
  padding provably never strictly beat any real value. The hot SW
  score-only path therefore runs with *zero* per-column masking or
  reductions: a single running elementwise max over the ramped H column,
  reduced once at block end. (Proof sketch: pad-column H comes only from
  decayed E/F chains of real values, pad-row H only from F of real rows
  minus at least Go; both <= the running real maximum, and SW scores are
  >= 0 by the clamp, matching the reference's non-negative SW scores.)

- **State lives in VMEM scratch across grid steps** (H, E columns and
  per-lane trackers); the grid walks target-position chunks with letters
  auto-double-buffered.

- **float32 arithmetic, integer-exact.** Measured on TPU v5e, f32 VPU ops
  run ~2x faster than int32; all DP values are integers and stay well below
  2^24, so f32 add/sub/max are exact. This replaces the reference's
  precision cascade: f32 direct is always exact under the documented input
  constraints (|scores|, gaps < 2^20), with analytical overflow *flags* for
  cascade/API parity computed from the same pass (see engine/cascade.py).
  (TPU's VPU has no 8/16-bit lane-splitting advantage comparable to
  SSE/AVX, so int8/int16 passes would not pay as they do there.)

Tracker semantics replicate the reference's tie-breaks exactly: best score at
the smallest target position, then smallest query position (src/opal.h:44-46),
via strict-improvement updates and first-argmax row selection.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MODE_HW, MODE_NW, MODE_OV, MODE_SW, SEARCH_SCORE

NEG = -(2**30)
PAD_NEG = -(2**20)   # profile value of padding rows/letters (bf16-exact)
A_PAD = 32           # one-hot width / MXU contraction dim
PAD_LETTER = A_PAD - 1  # reserved letter index used for all padding
LANE_BLOCK = 512     # default B (DB sequences per kernel call)
T_CHUNK = 64         # target positions per grid step

# Columns processed per loop iteration with state threaded as values
# between them (one VMEM round trip of the per-cell state per group).
# 4 measured fastest on v5e (tools/exp_unroll.py: 108.7 / 113.4 / 115.7
# padded GCUPS for 1 / 2 / 4 at Q_pad=112); must divide T_CHUNK.
COL_UNROLL = int(os.environ.get("OPAL_TPU_COL_UNROLL", "4"))
if COL_UNROLL < 1 or T_CHUNK % COL_UNROLL:
    raise ValueError(
        f"OPAL_TPU_COL_UNROLL must be a positive divisor of "
        f"T_CHUNK={T_CHUNK}; got {COL_UNROLL}"
    )
# DP-state budget: scratch arrays only; compiler temporaries take roughly
# another 1.5x of it, all inside VMEM_LIMIT (validated on v5e at Q=3000,
# B=1024: 3 x 12M scratch + temps fit under the 100M scoped ceiling).
VMEM_STATE_BUDGET = 36 * 1024 * 1024
# At the narrowest lane width the compiler's temporaries are small, so a
# larger share of VMEM can hold DP state — extends the pallas fast path to
# titin-scale queries (Q ~ 43k at B=128; validated on v5e at Q=34,350:
# 64.6 GCUPS vs ~16 on the XLA fallback, oracle-exact).
VMEM_STATE_BUDGET_NARROW = 64 * 1024 * 1024
VMEM_LIMIT = 100 * 1024 * 1024  # Mosaic scoped-VMEM ceiling (v5e has 128M)
VMEM_LIMIT_BIG = 120 * 1024 * 1024
# DP-state bytes beyond which a config compiles with the raised ceiling:
# compiler temporaries are not a fixed multiple of the state (measured on
# v5e: Q_pad=3000 x B=1024 x 3 arrays fits 100M, but Q_pad=6000 x 512 x 3 —
# the same 36.9M of state — needs 108.6M), so raise the cap with margin.
BIG_STATE_BYTES = 24 * 1024 * 1024

# Query-panel streaming: panel height cap and the score+end panel AREA
# ceiling (cells) past which Mosaic's threaded end-tracker temporaries
# spill out of VMEM. See PallasBackend._dispatch_panels for the measured
# sweep behind both numbers.
PANEL_ROWS_CAP = 1504
PANEL_X1_AREA = 1536 * 1024


def state_budget(B: int) -> int:
    return VMEM_STATE_BUDGET_NARROW if B <= 128 else VMEM_STATE_BUDGET

# Multi-query stacking (SW score-only): queries stacked along the row axis
# as independent DP segments; the segmented max-plus scan is realized by
# offsetting each segment's ramp by s*SEG_M so cross-segment candidates are
# always dominated. Exactness needs n_seg*SEG_M + |values| < 2^24 (f32) and
# |DP values| < SEG_M - Q_pad*Ge, hence the tighter 2^18 value bound here.
SEG_M = float(2**19)
MULTI_MAX_SEGS = 8
MULTI_VALUE_BOUND = 2**18
# Stacked column area (rows x lanes) beyond which VMEM pressure makes the
# stacked pass slower than sequential launches (measured on v5e: 896x2048
# regresses, 896x1024 and 448x2048 win); the dispatcher packs query groups
# within this budget.
MULTI_AREA_BUDGET = 1 << 20


def _compiler_params(interpret: bool, big_state: bool = False):
    # big_state: narrow-lane long-query configs run with DP state beyond
    # the standard budget; raise the scoped-VMEM cap accordingly (v5e has
    # 128M; 120M validated at B=128, Q_pad=34368).
    return None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=VMEM_LIMIT_BIG if big_state else VMEM_LIMIT
    )


def n_state_arrays(mode: int, search_type: int, with_flags: bool,
                   sw_end_packed: bool = False) -> int:
    """[Q_pad, B] f32 VMEM scratch arrays a config needs (H, E, + extras):
    SW keeps a running elementwise max m; SW with end tracking adds the
    per-cell first-attainment column c (see _kernel_body's SW tracker
    notes) — unless the packed-key scheme applies, which replaces BOTH m
    and c with one key array (see sw_end_packed_ok); OV with end tracking
    keeps the end-column snapshot (score-only OV snapshots a [1,B] colmax
    instead)."""
    if mode == MODE_SW:
        if search_type == SEARCH_SCORE or sw_end_packed:
            return 3
        return 4
    ov_end = mode == MODE_OV and search_type != SEARCH_SCORE
    return 3 if ov_end else 2


def sw_end_packed_ok(Q: int, absmax: int, ge: int) -> bool:
    """May SW end tracking use the packed-key scheme?

    The scheme packs (ramped H, column-within-chunk) into ONE f32 per cell:
    key = H~ + (TC-1-tt)/TC, a 6-bit fraction below integer-valued H~. A
    single running max per column then encodes, per cell, the running max
    of H~ AND its first-attainment column within the chunk (DP values are
    integers, so a strict improvement is >= 1 and always dominates the
    fraction; among equal H~ the earlier column's larger fraction wins).
    A once-per-chunk merge reduces the per-chunk keys into [1, B] lane
    trackers (best, end_q, end_t), replicating the reference tie-break —
    best score at smallest end_t, then smallest end_q (src/opal.h:44-46).

    Exactness needs bits(H~) + 6 <= 24 (f32 mantissa): max H~ =
    SW score bound + ramp <= Q*absmax + Q_pad*ge < 2^18. Configs beyond
    the bound (long queries x large matrices) use the classic per-cell
    (m, c) scheme. OPAL_TPU_SW_END_PACKED=0/1 overrides for A/B runs."""
    ov = os.environ.get("OPAL_TPU_SW_END_PACKED")
    if ov in ("0", "1"):
        return ov == "1"
    Q_pad = _round_up(max(Q, 16), 16)
    return Q * absmax + Q_pad * ge + 64 < 2**18


def max_q_pad(B: int, arrays: int = 3) -> int:
    """Largest supported padded query length for lane width B: the f32 DP
    state arrays must fit the VMEM budget alongside the working set. At the
    narrow width the compiler's per-column [Q_pad, B] temporaries are the
    binding constraint, so 2-array configs are capped at the validated
    3-array ceiling (~43k) rather than allowed to grow to 64k."""
    arrays_eff = max(arrays, 3) if B <= 128 else arrays
    return (state_budget(B) // (arrays_eff * 4 * B)) // 16 * 16

# tracker rows in the [8, B] tracker scratch/output
TR_BEST = 0      # SW best score / NW-HW-OV last-row running max
TR_BEST_R = 1    # SW best row (query end)
TR_BEST_C = 2    # SW best col / HW-OV first-improvement column
TR_NW = 3        # NW score snapshot (H[Q-1] at t == len-1)
TR_OV_PLRM = 4   # OV prev-last-row-max snapshot at sequence end
TR_OV_CMAX = 5   # OV last-column max snapshot
TR_OV_ROW = 6    # OV last-column first-argmax row snapshot
TR_ULHP = 7      # running max of ulH+P (SW overflow-flag tracker)
TR_MIN_E = 8     # running min of E (NW/HW/OV overflow flags)
TR_MIN_F = 9     # running min of F
TR_MAX_H = 10    # running max of H
TR_ROWS = 16     # tracker scratch rows (padded to a full sublane tile)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def tracker_rows(mode, search_type, with_flags):
    """Which tracker rows a config needs in its output (slim transfers)."""
    track_end = search_type != SEARCH_SCORE
    if mode == MODE_SW:
        rows = [TR_BEST] + ([TR_BEST_R, TR_BEST_C] if track_end else [])
    elif mode == MODE_NW:
        rows = [TR_NW]
    elif mode == MODE_HW:
        rows = [TR_BEST] + ([TR_BEST_C] if track_end else [])
    else:  # OV: score/end disambiguation happens at emit (on device), so
        # the payload is as slim as SW's (the tunnel/PCIe result download
        # is a measurable cost at whole-database scale)
        rows = [TR_BEST] + ([TR_BEST_R, TR_BEST_C] if track_end else [])
    if with_flags:
        if mode == MODE_SW:
            rows.append(TR_ULHP)
        else:
            rows.extend([TR_MIN_E, TR_MIN_F, TR_MAX_H])
    return tuple(rows)


def _kernel(
    qp_ref, letters_ref, lengths_ref, out_ref, h_ref, e_ref, *rest,
    mode, track_end, with_flags, Q, Q_pad, TC, B, go, ge, out_rows,
    is_first, is_last, chunk_t0, active=None, out_i16=False,
    sw_end_packed=False, ncols=None, panel=None, poff=None,
    bh_in=None, bx_in=None, bh_out=None, bx_out=None,
):
    # One grid step advances TC DP columns of one lane-block. State resets
    # when is_first (block's first chunk) and trackers emit when is_last;
    # chunk_t0 is the block-local column offset of this chunk. The grouped
    # wrapper derives these from the grid position, the ragged wrapper from
    # prefetched per-chunk metadata.
    # h_ref/e_ref hold the RAMPED DP column: H~ = H + r*Ge, E~ = E + r*Ge.
    # active (ragged path): 0 marks inert shape-padding chunks — skip all
    # compute (their letters are dummies and they never init or emit).
    kw = dict(
        mode=mode, track_end=track_end, with_flags=with_flags, Q=Q,
        Q_pad=Q_pad, TC=TC, B=B, go=go, ge=ge, out_rows=out_rows,
        is_first=is_first, is_last=is_last, chunk_t0=chunk_t0,
        out_i16=out_i16, sw_end_packed=sw_end_packed, ncols=ncols,
        panel=panel, poff=poff, bh_in=bh_in, bx_in=bx_in,
        bh_out=bh_out, bx_out=bx_out,
    )
    if active is not None:
        @pl.when(active())
        def _active_body():
            _kernel_body(qp_ref, letters_ref, lengths_ref, out_ref,
                         h_ref, e_ref, *rest, **kw)
        return
    _kernel_body(qp_ref, letters_ref, lengths_ref, out_ref, h_ref, e_ref,
                 *rest, **kw)


def _kernel_body(
    qp_ref, letters_ref, lengths_ref, out_ref, h_ref, e_ref, *rest,
    mode, track_end, with_flags, Q, Q_pad, TC, B, go, ge, out_rows,
    is_first, is_last, chunk_t0, out_i16=False, sw_end_packed=False,
    ncols=None, panel=None, poff=None, bh_in=None, bx_in=None,
    bh_out=None, bx_out=None,
):
    # panel (query-panel streaming, see build_pallas_panel_fn_raw): None
    # for the single-panel kernel, else {"first": bool, "final": bool}.
    # Non-first panels take their row-0 boundary per column from bh_in
    # (previous panel's last-row H at the previous column) and bx_in (the
    # F-chain seed at this column); non-final panels write the symmetric
    # bh_out/bx_out for the next panel. poff() is the panel's global row
    # offset (scalar-prefetched so interior panels share one compile);
    # emits are role-dependent (interior panels emit only the rows a host
    # merge needs).
    # ncols (ragged path): data-driven column count for this chunk — a
    # block's LAST chunk runs only its real t_pad - t0 columns instead of
    # the full T_CHUNK, skipping pure-padding tail columns (the 64-column
    # padding quantum wasted 7.8% of all DP work at Swiss-Prot scale).
    # Results are bit-identical: skipped columns are algebraic padding
    # (PAD_LETTER profiles) that no tracker can observe, and every lane
    # length satisfies len <= t0 + ncols, so sequence-end snapshots and
    # the packed-key chunk merge see exactly the same values.
    n_cols = TC if ncols is None else ncols()
    sw = mode == MODE_SW
    lean_sw = sw and not track_end
    sw_end = sw and track_end
    sw_packed = sw_end and sw_end_packed
    has_m = sw or (mode == MODE_OV and track_end)
    c_ref = key_ref = m_ref = None
    if sw_packed:
        key_ref, l32_ref, tr_ref = rest
    elif sw_end:
        m_ref, c_ref, l32_ref, tr_ref = rest
    elif has_m:
        m_ref, l32_ref, tr_ref = rest
    else:
        l32_ref, tr_ref = rest
    i32 = jnp.int32
    f32 = jnp.float32
    row_ids = jax.lax.broadcasted_iota(i32, (Q_pad, B), 0)
    row_valid = row_ids < Q
    is_row0 = row_ids == 0
    row_f = row_ids.astype(f32)
    ramp = row_f * ge
    lane_a = jax.lax.broadcasted_iota(i32, (A_PAD, B), 0)
    need_len = (not lean_sw) or with_flags
    lengths = lengths_ref[0] if need_len else None  # [1, B]

    @pl.when(is_first())
    def _init():
        if sw or mode == MODE_OV:
            h_ref[:] = ramp                       # H = 0, ramped
        elif panel is not None and not panel["first"]:
            # NW/HW first-column wall continues below the panel boundary:
            # H[off+r][-1] = -go - (off+r)*Ge -> ramped-local constant
            h_ref[:] = jnp.full((Q_pad, B), -go, f32) - (
                poff().astype(f32) * ge)
        else:
            h_ref[:] = jnp.full((Q_pad, B), -go, f32)   # H = -go - r*Ge, ramped
        e_ref[:] = ramp if sw else jnp.full((Q_pad, B), NEG, f32)
        if sw_packed:
            key_ref[:] = jnp.full((Q_pad, B), float(NEG), f32)
        elif sw:
            m_ref[:] = ramp                       # running max of H~, init H~
            if sw_end:
                c_ref[:] = jnp.zeros((Q_pad, B), f32)
        elif has_m:  # OV with end tracking
            m_ref[:] = jnp.full((Q_pad, B), NEG, f32)   # H~ at sequence end
        tr_rows = jax.lax.broadcasted_iota(i32, (TR_ROWS, B), 0)
        zero_rows = (
            (tr_rows == TR_BEST_R)
            | (tr_rows == TR_BEST_C)
            | (tr_rows == TR_OV_ROW)
            | (tr_rows == TR_MIN_E)
            | (tr_rows == TR_MIN_F)
            | ((tr_rows == TR_BEST) & sw)
        )
        tr_ref[:] = jnp.where(zero_rows, 0.0, float(NEG))

    chunk_t0 = chunk_t0()
    # Widen this chunk's int8 letters once (Mosaic can't dynamically
    # row-index an int8 memref); the loop indexes the i32 scratch.
    l32_ref[:] = letters_ref[0].astype(i32)

    # OV's sequence-end snapshots touch full [Q_pad, B] state, but lanes are
    # length-sorted: almost all chunks contain no sequence end. One scalar
    # flag per chunk (any lane ends inside this chunk's TC columns) selects
    # between two specialized column loops, so end-free chunks run a loop
    # with zero snapshot code (same per-column cost as HW).
    chunk_has_end = None
    if mode == MODE_OV:
        end_in_chunk = (lengths > chunk_t0) & (lengths <= chunk_t0 + TC)
        chunk_has_end = jnp.any(end_in_chunk)

    def compute_profile(tt):
        """P'[r, lane] = matrix[query[r], letter[lane]] + Ge via one-hot MXU
        matmul — exact (integer-valued bf16 inputs, f32 accumulate). The +Ge
        is baked into qp at prepare time (ramped-space diagonal candidate)."""
        letters_t = l32_ref[pl.ds(tt, 1), :]  # [1, B]
        onehot = (lane_a == letters_t).astype(jnp.bfloat16)  # [A_PAD, B]
        return jnp.dot(
            qp_ref[:], onehot, preferred_element_type=jnp.float32
        )  # [Q_pad, B] f32

    # [1,B] tracker rows updated every column are carried through the
    # column loop as register values: a per-column sub-tile store into the
    # [16,B] tracker scratch is a read-modify-write measured at ~15-20% of
    # the whole column's cost; carrying them writes VMEM once per chunk.
    if sw:
        carried = []  # per-cell m (+ c for end tracking), no per-column rows
    elif mode == MODE_NW:
        carried = [TR_NW]
    elif mode == MODE_HW:
        carried = [TR_BEST] + ([TR_BEST_C] if track_end else [])
    else:  # OV
        carried = [TR_BEST] + (
            [TR_BEST_C, TR_OV_PLRM] if track_end else [TR_OV_CMAX])
    if with_flags:
        carried += [TR_ULHP] if sw else [TR_MIN_E, TR_MIN_F, TR_MAX_H]
    cpos = {r: j for j, r in enumerate(carried)}

    # Columns are processed COL_UNROLL per loop iteration with the DP
    # state (and per-cell trackers) threaded between them as values: VMEM
    # read/write traffic for H/E/m/c/key divides by the group size, the
    # lean-SW running max fuses to one VMEM update per group, and loop
    # bookkeeping shrinks — measured +5-6% for pairs and a further +1-2%
    # for quads on v5e (tools/exp_unroll.py), bit-identical results. A
    # ragged chunk whose ncols is not a multiple of the group overshoots
    # by up to COL_UNROLL-1 columns that land on algebraic padding
    # (letters rows beyond ncols hold PAD_LETTER):
    # SW trackers can only tie, never strictly improve, on pad columns
    # (ties keep the earlier record — packed keys carry a smaller
    # fraction for later columns, classic c updates only on strict
    # improvement), and every non-SW tracker update is guarded by
    # t < lengths <= t0 + ncols, so the overshoot is unobservable.
    #
    # st: per-cell value tuple threaded through a column group — (H, E)
    # plus the config's per-cell trackers (lean SW's m stays OUT and fuses
    # in the group wrapper).
    lr_offf = float((Q - 1) * ge)  # unramp offset of the last real row

    def column(tt, st, carry, snap=True):
        t = chunk_t0 + tt
        Pp = compute_profile(tt)  # P + Ge

        Ht, Et = st[0], st[1]
        if bh_out is not None:
            # next panel's row-0 diag boundary at column t+1 is THIS
            # panel's last-row full H at column t; equivalently, what the
            # next panel needs at column t is Ht (the previous column's
            # state) — including the init state at t=0, which encodes the
            # mode's column -1 wall exactly.
            bh_out[0, pl.ds(tt, 1), :] = Ht[Q - 1 : Q, :] - lr_offf
        Enew = jnp.maximum(Ht - go, Et - ge)

        # virtual row -1 boundary values for this column
        if bh_in is not None:
            # row 0 sits below another panel: boundary rows per column
            ul0 = bh_in[0, pl.ds(tt, 1), :]   # H[off-1][t-1], [1, B]
            c0 = bx_in[0, pl.ds(tt, 1), :]    # F[off][t] seed,  [1, B]
        elif mode == MODE_NW:
            uH0 = (-go - t * ge).astype(f32)
            ul0 = jnp.where(t == 0, 0.0, uH0 + ge).astype(f32)
            c0 = jnp.maximum(uH0 - go, float(NEG - ge)).astype(f32)
        else:  # SW, HW, OV: H[-1, *] = 0
            ul0 = jnp.asarray(0.0, f32)
            c0 = jnp.asarray(-go, f32)  # max(0 - go, -inf - ge)

        # diag[r] = H[r-1,t-1] + P[r] + ramp[r] = H~[r-1] + (P[r] + Ge);
        # row 0 uses the boundary: ul0 + P[0] = ul0 + P'[0] - Ge.
        diag = pltpu.roll(Ht, 1, axis=0) + Pp
        diag = jnp.where(is_row0, Pp + (ul0 - ge), diag)
        Hp = jnp.maximum(Enew, diag)
        if sw:
            Hp = jnp.maximum(Hp, ramp)  # clamp H >= 0, ramped

        # F chain, ramped: X[r] = F[r] + ramp[r] = max-plus prefix of
        # X_in[r] = H'~[r-1] + (Ge - Go), with X_in[0] = c0 (ramp[0] = 0).
        X = pltpu.roll(Hp, 1, axis=0) + (ge - go)
        X = jnp.where(is_row0, c0, X)
        k = 1
        while k < Q_pad:
            shifted = pltpu.roll(X, k, axis=0)
            X = jnp.maximum(X, jnp.where(row_ids >= k, shifted, NEG))
            k *= 2
        Hnew = jnp.maximum(Hp, X)
        if bx_out is not None:
            # next panel's F-chain seed at column t: F[off_next][t] =
            # max(H[last][t] - Go, F[last][t] - Ge), F = X - ramp
            bx_out[0, pl.ds(tt, 1), :] = jnp.maximum(
                Hnew[Q - 1 : Q, :] - (lr_offf + go),
                X[Q - 1 : Q, :] - (lr_offf + ge),
            )
        out_st = [Hnew, Enew]

        # ---- trackers (carried [1,B] rows; see `carried` above) ----
        cv = list(carry)
        if sw:
            # padding is algebraic (PAD_LETTER profile): no masks, no
            # reduces. End tracking costs only 2 extra elementwise ops per
            # column: c records each cell's FIRST column attaining its
            # final running max (the last strict improvement); the
            # reference tie-break (best score at smallest end_t, then
            # smallest end_q, src/opal.h:44-46) resolves once at emit from
            # (m, c). This replaced a per-column colmax+argmax scheme that
            # trailed score-only by 25-30%.
            if sw_packed:
                # packed-key scheme (see sw_end_packed_ok): one runmax per
                # column carries (running max of H~, first-attainment
                # column within this chunk) in a single array — the same
                # per-column VMEM traffic as score-only.
                frac = (TC - 1 - tt).astype(f32) * (1.0 / TC)
                out_st.append(jnp.maximum(st[2], Hnew + frac))
            elif sw_end:
                out_st.append(jnp.maximum(st[2], Hnew))      # m
                out_st.append(jnp.where(                      # c
                    Hnew > st[2], t.astype(f32), st[3]))
            # lean SW: the running max fuses in the group wrapper
        else:
            valid = t < lengths          # [1, B]
            is_end = t == lengths - 1    # [1, B]
            lastrow = Hnew[Q - 1 : Q, :]  # [1, B], ramped by ramp[Q-1]
            if mode == MODE_NW:
                cv[cpos[TR_NW]] = jnp.where(
                    is_end, lastrow, cv[cpos[TR_NW]]
                )
            if mode == MODE_OV and track_end:
                # the end-column snapshot m threads through st even in
                # no-snap loops (st layout must not depend on `snap`)
                if snap:
                    # snapshot the whole ramped H column at sequence end;
                    # last-column max/argmax reduce once at emit. PLRM is
                    # the last-row max BEFORE this column's update
                    # (reference: prevMaxLastRowH, src/opal.cpp:746,886-903)
                    out_st.append(jnp.where(is_end, Hnew, st[2]))
                    cv[cpos[TR_OV_PLRM]] = jnp.where(
                        is_end, cv[cpos[TR_BEST]], cv[cpos[TR_OV_PLRM]]
                    )
                else:
                    out_st.append(st[2])
            elif mode == MODE_OV and snap:
                # score-only: snapshot just the column max (pad rows
                # are algebraically dominated, see module docstring)
                colmax_u = jnp.max(
                    jnp.where(row_valid, Hnew - ramp, NEG),
                    axis=0, keepdims=True,
                )
                cv[cpos[TR_OV_CMAX]] = jnp.where(
                    is_end, colmax_u, cv[cpos[TR_OV_CMAX]]
                )
            if mode in (MODE_HW, MODE_OV):
                best = cv[cpos[TR_BEST]]
                lr_improved = valid & (lastrow > best)
                cv[cpos[TR_BEST]] = jnp.where(lr_improved, lastrow, best)
                if track_end:
                    cv[cpos[TR_BEST_C]] = jnp.where(
                        lr_improved, t.astype(f32), cv[cpos[TR_BEST_C]]
                    )

        if with_flags:
            valid = t < lengths
            vmask = row_valid & valid
            if sw:
                # ulH + P = diag - ramp (diag holds ulH + P + ramp)
                ulhp_max = jnp.max(
                    jnp.where(vmask, diag - ramp, NEG), axis=0, keepdims=True
                )
                cv[cpos[TR_ULHP]] = jnp.maximum(cv[cpos[TR_ULHP]], ulhp_max)
            else:
                cv[cpos[TR_MIN_E]] = jnp.minimum(
                    cv[cpos[TR_MIN_E]],
                    jnp.min(jnp.where(vmask, Enew - ramp, 0.0), axis=0,
                            keepdims=True),
                )
                cv[cpos[TR_MIN_F]] = jnp.minimum(
                    cv[cpos[TR_MIN_F]],
                    jnp.min(jnp.where(vmask, X - ramp, 0.0), axis=0,
                            keepdims=True),
                )
                cv[cpos[TR_MAX_H]] = jnp.maximum(
                    cv[cpos[TR_MAX_H]],
                    jnp.max(jnp.where(vmask, Hnew - ramp, NEG), axis=0,
                            keepdims=True),
                )
        return tuple(out_st), tuple(cv)

    init = tuple(tr_ref[r : r + 1, :] for r in carried)
    # per-cell VMEM refs threaded through a column group (lean SW's m is
    # NOT threaded: it fuses to one update per group below)
    if sw_packed:
        st_refs = [key_ref]
    elif sw_end:
        st_refs = [m_ref, c_ref]
    elif has_m and track_end:  # OV end-column snapshot
        st_refs = [m_ref]
    else:
        st_refs = []

    def group(uu, carry, snap=True):
        st = (h_ref[:], e_ref[:]) + tuple(r[:] for r in st_refs)
        hs = []
        for j in range(COL_UNROLL):
            st, carry = column(COL_UNROLL * uu + j, st, carry, snap)
            hs.append(st[0])
        h_ref[:] = st[0]
        e_ref[:] = st[1]
        for j, r in enumerate(st_refs):
            r[:] = st[2 + j]
        if lean_sw:
            m_ref[:] = jnp.maximum(
                m_ref[:], functools.reduce(jnp.maximum, hs))
        return carry

    def writeback(carry):
        for j, r in enumerate(carried):
            tr_ref[pl.ds(r, 1), :] = carry[j]

    n_groups = (n_cols + COL_UNROLL - 1) // COL_UNROLL
    if chunk_has_end is None:
        writeback(jax.lax.fori_loop(0, n_groups, group, init))
    else:
        @pl.when(chunk_has_end)
        def _loop_snap():
            writeback(jax.lax.fori_loop(
                0, n_groups, lambda uu, c: group(uu, c, True), init))

        @pl.when(jnp.logical_not(chunk_has_end))
        def _loop_lean():
            writeback(jax.lax.fori_loop(
                0, n_groups, lambda uu, c: group(uu, c, False), init))

    if sw_packed:
        # Once-per-chunk merge of the packed keys into the [1, B] lane
        # trackers. Decode (m~ = floor(key), first column = TC-1 -
        # 64*frac); a strict per-lane improvement updates (best, end_q,
        # end_t) from this chunk's eligible cells. Pad columns can never
        # strictly precede a real attainment of an improving value (their
        # profile is PAD_NEG, so new values are only created in real
        # columns; propagated values never strictly improve), and a
        # non-improving chunk (all pad, or go==ge==0 plateaus) keeps the
        # earlier chunk's record — exactly the reference's first-strict-
        # improvement tie-break (src/opal.cpp:306-314,384-401).
        key = key_ref[:]
        mf = jnp.floor(key)
        m_u = jnp.where(row_valid, mf - ramp, float(NEG))
        chunk_best = jnp.max(m_u, axis=0, keepdims=True)
        c_cell = chunk_t0.astype(f32) + (float(TC - 1) - (key - mf) * TC)
        elig = m_u == chunk_best
        big = float(2**30)
        end_t = jnp.min(
            jnp.where(elig, c_cell, big), axis=0, keepdims=True
        )
        end_q = jnp.min(
            jnp.where(elig & (c_cell == end_t), row_f, big),
            axis=0, keepdims=True,
        )
        prev = tr_ref[TR_BEST : TR_BEST + 1]
        improved = chunk_best > prev
        tr_ref[pl.ds(TR_BEST, 1), :] = jnp.where(improved, chunk_best, prev)
        tr_ref[pl.ds(TR_BEST_R, 1), :] = jnp.where(
            improved, end_q, tr_ref[TR_BEST_R : TR_BEST_R + 1]
        )
        tr_ref[pl.ds(TR_BEST_C, 1), :] = jnp.where(
            improved, end_t, tr_ref[TR_BEST_C : TR_BEST_C + 1]
        )
        key_ref[:] = jnp.full((Q_pad, B), float(NEG), f32)

    @pl.when(is_last())
    def _emit():
        # un-ramp the [1,B] trackers that live in ramped space
        lr_off = float((Q - 1) * ge)
        if lean_sw:
            tr_ref[pl.ds(TR_BEST, 1), :] = jnp.max(
                m_ref[:] - ramp, axis=0, keepdims=True
            )
        elif sw_packed:
            pass  # lane trackers are final and unramped (per-chunk merge)
        elif sw_end:
            # Resolve (score, end_t, end_q) from the per-cell running max m
            # and first-attainment column c. Eligible cells are those that
            # attained the lane best in a REAL column (c < len): a pad-row
            # or pad-column cell can only TIE the best (possible at
            # go==ge==0 via the F chain), and the true DP max is always
            # also attained by a real cell in a real column, so filtering
            # preserves the reference tie-break exactly.
            mu = jnp.where(row_valid, m_ref[:] - ramp, NEG)
            best = jnp.max(mu, axis=0, keepdims=True)
            lenf = lengths.astype(f32)  # [1, B]
            ok = (mu == best) & (c_ref[:] < lenf)
            end_t = jnp.min(
                jnp.where(ok, c_ref[:], float(2**30)),
                axis=0, keepdims=True,
            )
            end_q = jnp.min(
                jnp.where(ok & (c_ref[:] == end_t), row_f, float(Q_pad)),
                axis=0, keepdims=True,
            )
            tr_ref[pl.ds(TR_BEST, 1), :] = best
            tr_ref[pl.ds(TR_BEST_R, 1), :] = end_q
            tr_ref[pl.ds(TR_BEST_C, 1), :] = end_t
        elif mode == MODE_NW:
            if panel is None or panel["final"]:
                tr_ref[pl.ds(TR_NW, 1), :] = (
                    tr_ref[TR_NW : TR_NW + 1] - lr_off)
        elif mode == MODE_HW:
            if panel is None or panel["final"]:
                tr_ref[pl.ds(TR_BEST, 1), :] = (
                    tr_ref[TR_BEST : TR_BEST + 1] - lr_off)
        elif mode == MODE_OV and panel is not None:
            # panel role emit: raw components only; the OV score/end
            # disambiguation needs the cross-panel colmax and happens in
            # the host merge (finalize_trackers_panels)
            if panel["final"]:
                tr_ref[pl.ds(TR_BEST, 1), :] = (
                    tr_ref[TR_BEST : TR_BEST + 1] - lr_off)
            if track_end:
                Hu = m_ref[:] - ramp
                Hmask = jnp.where(row_valid, Hu, NEG)
                colmax = jnp.max(Hmask, axis=0, keepdims=True)
                cand = jnp.where(
                    row_valid & (Hu == colmax), row_f, float(Q_pad)
                )
                tr_ref[pl.ds(TR_OV_CMAX, 1), :] = colmax
                tr_ref[pl.ds(TR_OV_ROW, 1), :] = jnp.min(
                    cand, axis=0, keepdims=True)
                if panel["final"]:
                    tr_ref[pl.ds(TR_OV_PLRM, 1), :] = (
                        tr_ref[TR_OV_PLRM : TR_OV_PLRM + 1] - lr_off)
            # score-only: TR_OV_CMAX is already snapshotted per column
        elif mode == MODE_OV:
            # full OV finalize on device (reference end disambiguation,
            # src/opal.cpp:845-850,881-904): score = max(last-col max,
            # last-row max); end in the last column iff colmax beats the
            # pre-column last-row max (PLRM), else in the last row.
            best = tr_ref[TR_BEST : TR_BEST + 1] - lr_off
            if track_end:
                plrm = tr_ref[TR_OV_PLRM : TR_OV_PLRM + 1] - lr_off
                Hu = m_ref[:] - ramp
                Hmask = jnp.where(row_valid, Hu, NEG)
                colmax = jnp.max(Hmask, axis=0, keepdims=True)
                cand = jnp.where(
                    row_valid & (Hu == colmax), row_f, float(Q_pad)
                )
                ovrow = jnp.min(cand, axis=0, keepdims=True)
                in_last = colmax > plrm
                tr_ref[pl.ds(TR_BEST, 1), :] = jnp.maximum(colmax, best)
                tr_ref[pl.ds(TR_BEST_R, 1), :] = jnp.where(
                    in_last, ovrow, float(Q - 1)
                )
                tr_ref[pl.ds(TR_BEST_C, 1), :] = jnp.where(
                    in_last, (lengths - 1).astype(f32),
                    tr_ref[TR_BEST_C : TR_BEST_C + 1],
                )
            else:
                # score-only: TR_OV_CMAX snapshotted per column already
                tr_ref[pl.ds(TR_BEST, 1), :] = jnp.maximum(
                    best, tr_ref[TR_OV_CMAX : TR_OV_CMAX + 1]
                )
        for j, row in enumerate(out_rows):
            v = tr_ref[row : row + 1, :]
            if out_i16:
                v = jnp.clip(v, -32768.0, 32767.0)
            out_ref[0, j : j + 1, :] = v.astype(out_ref.dtype)


@functools.lru_cache(maxsize=None)
def build_pallas_score_fn_raw(
    mode: int,
    search_type: int,
    Q: int,
    go: int,
    ge: int,
    B: int = LANE_BLOCK,
    with_flags: bool = False,
    interpret: bool = False,
    out_i16: bool = False,
    sw_end_packed: bool = False,
):
    """Unjitted fn(qp_bf16[Q_pad, A_PAD], letters[G, T, B] i8,
    lengths[G, 1, B] i32) -> selected trackers [G, n_rows, B] i32
    (rows per tracker_rows()). T must be a multiple of T_CHUNK.

    qp must come from prepare_qp (P + Ge, PAD_NEG padding)."""
    if ge > go:
        raise ValueError("pallas path requires gap_ext <= gap_open")
    track_end = search_type != SEARCH_SCORE
    Q_pad = _round_up(max(Q, 16), 16)
    arrays = n_state_arrays(mode, search_type, with_flags, sw_end_packed)
    if Q_pad > max_q_pad(B, arrays):
        raise ValueError(
            f"query too long for pallas path at lane width {B} ({Q}); "
            f"use a smaller Engine block_size"
        )
    out_rows = tracker_rows(mode, search_type, with_flags)
    n_extra = arrays - 2  # m (SW / OV-end), c (SW end), or the packed key

    def fn(qp, letters, lengths):
        """letters: [G, T, B] int8 (G lane-blocks sharing padded length T,
        padded with PAD_LETTER); lengths: [G, 1, B] int32. Returns trackers
        [G, n_rows, B] int32.

        letters stay int8 end-to-end (4x cheaper host->device transfer, HBM
        footprint, and kernel streaming); widened per column inside the
        kernel. All G blocks run inside ONE pallas_call (grid leading dim)
        to amortize per-call dispatch latency."""
        G, T = letters.shape[0], letters.shape[1]
        assert T % T_CHUNK == 0, T
        grid = (G, T // T_CHUNK)
        kernel = functools.partial(
            _kernel,
            mode=mode, track_end=track_end, with_flags=with_flags,
            Q=Q, Q_pad=Q_pad, TC=T_CHUNK, B=B, go=go, ge=ge,
            out_rows=out_rows, out_i16=out_i16,
            sw_end_packed=sw_end_packed,
            is_first=lambda: pl.program_id(1) == 0,
            is_last=lambda: pl.program_id(1) == pl.num_programs(1) - 1,
            chunk_t0=lambda: pl.program_id(1) * T_CHUNK,
        )
        scratch = [
            pltpu.VMEM((Q_pad, B), jnp.float32)
            for _ in range(2 + n_extra)
        ]
        scratch.append(pltpu.VMEM((T_CHUNK, B), jnp.int32))
        scratch.append(pltpu.VMEM((TR_ROWS, B), jnp.float32))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Q_pad, A_PAD), lambda g, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T_CHUNK, B), lambda g, i: (g, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, B), lambda g, i: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, len(out_rows), B),
                                   lambda g, i: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (G, len(out_rows), B),
                jnp.int16 if out_i16 else jnp.int32,
            ),
            scratch_shapes=scratch,
            cost_estimate=pl.CostEstimate(
                flops=(2 * Q_pad * A_PAD + 40 * Q_pad) * B * T * G,
                bytes_accessed=T * B * G + 2 * Q_pad * A_PAD,
                transcendentals=0,
            ),
            compiler_params=_compiler_params(
                interpret,
                big_state=Q_pad * B * 4 * arrays > BIG_STATE_BYTES,
            ),
            interpret=interpret,
        )(qp, letters, lengths)

    return fn


@functools.lru_cache(maxsize=None)
def build_pallas_ragged_fn_raw(
    mode: int,
    search_type: int,
    Q: int,
    go: int,
    ge: int,
    B: int = LANE_BLOCK,
    with_flags: bool = False,
    interpret: bool = False,
    out_i16: bool = False,
    sw_end_packed: bool = False,
):
    """Whole-database scorer in ONE pallas_call over a ragged chunk stream.

    The grouped path pays one pallas_call per distinct padded length
    (typically ~20 per database); this path walks a single flat stream of
    T_CHUNK-column chunks — each lane-block contributes exactly
    ceil(maxlen/TC) chunks, back to back — with per-chunk scalar-prefetched
    metadata saying where blocks begin/end. One launch, zero inter-bucket
    padding, perfect double-buffering across block boundaries. This is the
    TPU answer to the reference's lane-refill conveyor keeping SIMD lanes
    busy across unequal sequence lengths (src/opal.cpp:472-490).

    fn(meta[6, C] i32, qp[Q_pad, A_PAD] bf16, letters[C, TC, B] i8,
       lengths[NB, 1, B] i32) -> trackers [NB, n_rows, B] i32.
    meta rows: (block index, is-first-chunk, is-last-chunk, t0 columns,
    active, ncols); row-major [6, C] so the SMEM lane-stripe padding lands
    on the long dim; active=0 marks inert shape-padding chunks (skipped
    entirely); ncols < T_CHUNK on a block's last chunk skips the padding
    quantum's tail columns (see _kernel_body).
    """
    if ge > go:
        raise ValueError("pallas path requires gap_ext <= gap_open")
    track_end = search_type != SEARCH_SCORE
    Q_pad = _round_up(max(Q, 16), 16)
    arrays = n_state_arrays(mode, search_type, with_flags, sw_end_packed)
    if Q_pad > max_q_pad(B, arrays):
        raise ValueError(
            f"query too long for pallas path at lane width {B} ({Q})"
        )
    out_rows = tracker_rows(mode, search_type, with_flags)
    n_extra = arrays - 2  # m (SW / OV-end), c (SW end), or the packed key

    def fn(meta, qp, letters, lengths):
        C = letters.shape[0]
        assert meta.shape == (6, C), meta.shape
        NB = lengths.shape[0]
        def kernel_wrapper(meta_ref, *refs):
            c = pl.program_id(0)
            functools.partial(
                _kernel,
                mode=mode, track_end=track_end, with_flags=with_flags,
                Q=Q, Q_pad=Q_pad, TC=T_CHUNK, B=B, go=go, ge=ge,
                out_rows=out_rows, out_i16=out_i16,
                sw_end_packed=sw_end_packed,
                is_first=lambda: meta_ref[1, c] == 1,
                is_last=lambda: meta_ref[2, c] == 1,
                chunk_t0=lambda: meta_ref[3, c],
                active=lambda: meta_ref[4, c] == 1,
                ncols=lambda: meta_ref[5, c],
            )(*refs)

        scratch = [
            pltpu.VMEM((Q_pad, B), jnp.float32)
            for _ in range(2 + n_extra)
        ]
        scratch.append(pltpu.VMEM((T_CHUNK, B), jnp.int32))
        scratch.append(pltpu.VMEM((TR_ROWS, B), jnp.float32))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((Q_pad, A_PAD), lambda c, m: (0, 0)),
                pl.BlockSpec((1, T_CHUNK, B), lambda c, m: (c, 0, 0)),
                pl.BlockSpec((1, 1, B), lambda c, m: (m[0, c], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, len(out_rows), B),
                                   lambda c, m: (m[0, c], 0, 0)),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel_wrapper,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (NB, len(out_rows), B),
                jnp.int16 if out_i16 else jnp.int32,
            ),
            cost_estimate=pl.CostEstimate(
                flops=(2 * Q_pad * A_PAD + 40 * Q_pad) * B * T_CHUNK * C,
                bytes_accessed=T_CHUNK * B * C + 2 * Q_pad * A_PAD,
                transcendentals=0,
            ),
            compiler_params=_compiler_params(
                interpret,
                big_state=Q_pad * B * 4 * arrays > BIG_STATE_BYTES,
            ),
            interpret=interpret,
        )(meta, qp, letters, lengths)

    return fn


@functools.lru_cache(maxsize=None)
def build_pallas_ragged_fn(*args, **kw):
    """Jitted ragged-stream scorer (see build_pallas_ragged_fn_raw)."""
    return jax.jit(build_pallas_ragged_fn_raw(*args, **kw))


def panel_tracker_rows(mode, search_type, with_flags, final):
    """Tracker rows a query-panel kernel emits. Interior panels emit only
    what the cross-panel host merge needs (SW per-panel records, OV
    end-column stats, overflow flags); the final panel adds the last-row
    trackers that only exist in the last real query row."""
    track_end = search_type != SEARCH_SCORE
    if mode == MODE_SW:
        rows = [TR_BEST] + ([TR_BEST_R, TR_BEST_C] if track_end else [])
    elif mode == MODE_NW:
        rows = [TR_NW] if final else []
    elif mode == MODE_HW:
        rows = ([TR_BEST] + ([TR_BEST_C] if track_end else [])
                if final else [])
    else:  # OV: per-panel end-column stats + final-panel last-row rows
        if track_end:
            rows = ([TR_BEST, TR_BEST_C, TR_OV_PLRM] if final else [])
            rows += [TR_OV_CMAX, TR_OV_ROW]
        else:
            rows = ([TR_BEST] if final else []) + [TR_OV_CMAX]
    if with_flags:
        rows += [TR_ULHP] if mode == MODE_SW else [
            TR_MIN_E, TR_MIN_F, TR_MAX_H]
    return tuple(rows) if rows else (TR_BEST,)  # non-empty output


@functools.lru_cache(maxsize=None)
def build_pallas_panel_fn_raw(
    mode: int,
    search_type: int,
    Q: int,              # this panel's REAL query rows
    go: int,
    ge: int,
    B: int = LANE_BLOCK,
    with_flags: bool = False,
    interpret: bool = False,
    out_i16: bool = False,
    sw_end_packed: bool = False,
    first: bool = True,
    final: bool = True,
):
    """One query panel of the panel-streamed whole-database scorer.

    Query-panel streaming removes the VMEM query-length ceiling that the
    single-launch kernels have (DP state is [Q_pad, B] f32 in VMEM): the
    query is split into row panels of at most max_q_pad(B) rows, and each
    panel sweeps the ENTIRE ragged chunk stream at full lane width,
    exchanging per-column boundary rows with the next panel through HBM —
    bh[c, tt, :] = the panel's last-row H at the previous column (the next
    panel's row-0 diagonal boundary), bx[c, tt, :] = the next panel's
    row-0 F-chain seed max(H_last - Go, F_last - Ge). Boundary traffic is
    2 rows per column vs a whole [Q_pad, B] column of compute, so long
    queries run at near short-query throughput — the TPU answer to the
    reference's architecturally unbounded column streaming
    (src/opal.cpp:245-249, :668-681), which the round-2 design capped at
    ~43k residues (B=128 VMEM ceiling) with a 4-7x XLA-fallback cliff.

    fn(meta[6, C] i32, poff[1] i32 (global row offset of this panel),
       qp[Q_pad, A_PAD] bf16 (this panel's profile rows),
       letters[C, TC, B] i8, lengths[NB, 1, B] i32,
       *([bh_in, bx_in] f32 [C, TC, B] unless first)
    ) -> (trackers [NB, n_rows, B], *([bh_out, bx_out] unless final))

    Panels must run in order (panel p+1 consumes p's boundary outputs);
    interior panels of a given split share one compiled kernel (the row
    offset is an operand, not a constant). Host-merge the per-panel
    trackers with finalize_trackers_panels."""
    if ge > go:
        raise ValueError("pallas path requires gap_ext <= gap_open")
    track_end = search_type != SEARCH_SCORE
    Q_pad = _round_up(max(Q, 16), 16)
    arrays = n_state_arrays(mode, search_type, with_flags, sw_end_packed)
    if Q_pad > max_q_pad(B, arrays):
        raise ValueError(
            f"panel too tall for lane width {B} ({Q})")
    out_rows = panel_tracker_rows(mode, search_type, with_flags, final)
    n_extra = arrays - 2
    panel = {"first": first, "final": final}

    def fn(meta, poff, qp, letters, lengths, *bnd_in):
        C = letters.shape[0]
        assert meta.shape == (6, C), meta.shape
        assert len(bnd_in) == (0 if first else 2)
        NB = lengths.shape[0]

        def kernel_wrapper(meta_ref, poff_ref, *refs):
            c = pl.program_id(0)
            n_in = 3 + (0 if first else 2)
            ins, outs = refs[:n_in], refs[n_in:]
            qp_ref, letters_ref, lengths_ref = ins[:3]
            bh_i, bx_i = (None, None) if first else ins[3:5]
            out_ref = outs[0]
            bh_o, bx_o = (None, None) if final else outs[1:3]
            scratch = outs[1 if final else 3:]
            functools.partial(
                _kernel,
                mode=mode, track_end=track_end, with_flags=with_flags,
                Q=Q, Q_pad=Q_pad, TC=T_CHUNK, B=B, go=go, ge=ge,
                out_rows=out_rows, out_i16=out_i16,
                sw_end_packed=sw_end_packed,
                is_first=lambda: meta_ref[1, c] == 1,
                is_last=lambda: meta_ref[2, c] == 1,
                chunk_t0=lambda: meta_ref[3, c],
                active=lambda: meta_ref[4, c] == 1,
                ncols=lambda: meta_ref[5, c],
                panel=panel, poff=lambda: poff_ref[0],
                bh_in=bh_i, bx_in=bx_i, bh_out=bh_o, bx_out=bx_o,
            )(qp_ref, letters_ref, lengths_ref, out_ref, *scratch)

        scratch = [
            pltpu.VMEM((Q_pad, B), jnp.float32)
            for _ in range(2 + n_extra)
        ]
        scratch.append(pltpu.VMEM((T_CHUNK, B), jnp.int32))
        scratch.append(pltpu.VMEM((TR_ROWS, B), jnp.float32))
        bnd_spec = pl.BlockSpec((1, T_CHUNK, B), lambda c, m, p: (c, 0, 0))
        bnd_shape = jax.ShapeDtypeStruct((C, T_CHUNK, B), jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((Q_pad, A_PAD), lambda c, m, p: (0, 0)),
                pl.BlockSpec((1, T_CHUNK, B), lambda c, m, p: (c, 0, 0)),
                pl.BlockSpec((1, 1, B), lambda c, m, p: (m[0, c], 0, 0)),
            ] + ([] if first else [bnd_spec, bnd_spec]),
            out_specs=[
                pl.BlockSpec((1, len(out_rows), B),
                             lambda c, m, p: (m[0, c], 0, 0)),
            ] + ([] if final else [bnd_spec, bnd_spec]),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel_wrapper,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(
                    (NB, len(out_rows), B),
                    jnp.int16 if out_i16 else jnp.int32),
            ] + ([] if final else [bnd_shape, bnd_shape]),
            cost_estimate=pl.CostEstimate(
                flops=(2 * Q_pad * A_PAD + 40 * Q_pad) * B * T_CHUNK * C,
                bytes_accessed=T_CHUNK * B * C * (1 + 8 * (not first)
                                                  + 8 * (not final)),
                transcendentals=0,
            ),
            compiler_params=_compiler_params(interpret, big_state=True),
            interpret=interpret,
        )(meta, poff, qp, letters, lengths, *bnd_in)
        return out

    return fn


@functools.lru_cache(maxsize=None)
def build_pallas_panel_fn(*args, **kw):
    """Jitted panel scorer (see build_pallas_panel_fn_raw)."""
    return jax.jit(build_pallas_panel_fn_raw(*args, **kw))


def finalize_trackers_panels(trs, offsets, qs, mode, search_type,
                             lengths, with_flags: bool = False):
    """Merge per-panel tracker rows into score/end outputs (host side).

    trs: one [n_rows_p, B] int array per panel (rows follow
    panel_tracker_rows with final=(p == last)); offsets/qs: each panel's
    global row offset and real row count. Reproduces the reference's
    tie-breaks exactly across the panel boundary: best score at the
    smallest end_t, then smallest end_q (src/opal.h:44-46); OV end
    disambiguation via prev-last-row-max (src/opal.cpp:845-850,881-904)."""
    n_p = len(trs)
    Q_total = offsets[-1] + qs[-1]
    track_end = search_type != SEARCH_SCORE
    big = np.int64(1) << 40
    rowmaps = []
    for p in range(n_p):
        rows = panel_tracker_rows(mode, search_type, with_flags,
                                  final=(p == n_p - 1))
        rowmaps.append(
            {r: trs[p][j].astype(np.int64) for j, r in enumerate(rows)})
    last = rowmaps[-1]
    out = {}
    if mode == MODE_SW:
        bests = np.stack([rm[TR_BEST] for rm in rowmaps])  # [P, B]
        score = bests.max(axis=0)
        out["score"] = score
        if track_end:
            endts = np.stack([rm[TR_BEST_C] for rm in rowmaps])
            endqs = np.stack([rowmaps[p][TR_BEST_R] + offsets[p]
                              for p in range(n_p)])
            att = bests == score
            end_t = np.where(att, endts, big).min(axis=0)
            end_q = np.where(att & (endts == end_t), endqs, big).min(axis=0)
            out["end_q"] = end_q
            out["end_t"] = end_t
    elif mode == MODE_NW:
        out["score"] = last[TR_NW]
        if track_end:
            out["end_q"] = np.full_like(last[TR_NW], Q_total - 1)
            out["end_t"] = np.asarray(lengths, np.int64) - 1
    elif mode == MODE_HW:
        out["score"] = last[TR_BEST]
        if track_end:
            out["end_q"] = np.full_like(last[TR_BEST], Q_total - 1)
            out["end_t"] = last[TR_BEST_C]
    else:  # OV
        cmaxs = np.stack([rm[TR_OV_CMAX] for rm in rowmaps])
        colmax = cmaxs.max(axis=0)
        out["score"] = np.maximum(colmax, last[TR_BEST])
        if track_end:
            rows_g = np.stack([rowmaps[p][TR_OV_ROW] + offsets[p]
                               for p in range(n_p)])
            ovrow = np.where(cmaxs == colmax, rows_g, big).min(axis=0)
            in_last = colmax > last[TR_OV_PLRM]
            out["end_q"] = np.where(in_last, ovrow, Q_total - 1)
            out["end_t"] = np.where(
                in_last, np.asarray(lengths, np.int64) - 1,
                last[TR_BEST_C])
    if with_flags:
        if mode == MODE_SW:
            out["max_ulhp"] = np.stack(
                [rm[TR_ULHP] for rm in rowmaps]).max(axis=0)
        else:
            out["min_e"] = np.stack(
                [rm[TR_MIN_E] for rm in rowmaps]).min(axis=0)
            out["min_f"] = np.stack(
                [rm[TR_MIN_F] for rm in rowmaps]).min(axis=0)
            out["max_h"] = np.stack(
                [rm[TR_MAX_H] for rm in rowmaps]).max(axis=0)
    return out


def _kernel_multi(
    qp_ref, letters_ref, lengths_ref, out_ref, h_ref, e_ref, m_ref, *rest,
    mode, seg_qs, seg_qpads, Q_pad, TC, B, go, ge,
    is_first, is_last, chunk_t0, track_end=False, out_i16=False,
    ncols=None,
):
    """Search with N queries stacked along the row axis (any mode,
    score-only or score+end).

    Each query is an independent DP segment. Segment isolation comes from
    the ramp itself: segment s is ramped by local_r*Ge + s*SEG_M, so any
    cross-segment candidate in the max-plus F scan arrives SEG_M lower and
    is dominated (exact while the DP value spread stays below SEG_M — the
    dispatcher gates on that bound). Segment-start rows take their
    virtual-row(-1) boundary from an explicit select, not from the
    neighbouring segment. One pass therefore scores all queries against the
    whole lane block — per-column fixed costs and launch overheads amortize
    across queries (measured on v5e: +5-40% over sequential launches,
    largest for short queries whose solo launches underfill the column).

    Per-segment trackers: SW keeps a shared running elementwise max (m);
    NW snapshots each segment's last real row at lane end; HW keeps each
    segment's running last-row max; OV keeps both the last-row trackers and
    a shared end-column snapshot (m), reduced per segment at emit.

    End tracking (track_end) mirrors the single-query kernel per segment:
    SW adds the per-cell first-attainment column c (segmented emit-time
    tie-break — the old 'SW end stacking needs a 42-bit lexicographic key'
    dead end applied only to packed runmax keys, not per-cell attainment);
    NW ends are constants (Q_s-1, len-1); HW/OV add per-segment argcol
    rows, OV also per-segment PLRM snapshots for end disambiguation
    (reference: src/opal.cpp:845-850,881-904).

    Out rows: n_seg scores (+ n_seg end_q, n_seg end_t when track_end),
    grouped [scores | end_qs | end_ts]."""
    i32, f32 = jnp.int32, jnp.float32
    sw = mode == MODE_SW
    sw_end = sw and track_end
    if sw_end:
        c_ref, l32_ref, tr_ref = rest
    else:
        c_ref = None
        l32_ref, tr_ref = rest
    n_seg = len(seg_qpads)
    starts = [0]
    for q in seg_qpads[:-1]:
        starts.append(starts[-1] + q)
    end_rows = [starts[s] + int(seg_qs[s]) - 1 for s in range(n_seg)]
    row_ids = jax.lax.broadcasted_iota(i32, (Q_pad, B), 0)
    lane_a = jax.lax.broadcasted_iota(i32, (A_PAD, B), 0)
    # hoisted segment constants (loop-invariant; Mosaic hoists)
    seg0 = row_ids == 0
    seg_idf = jnp.zeros((Q_pad, B), f32)
    start_vec = jnp.zeros((Q_pad, B), f32)
    for s in range(1, n_seg):
        at = int(starts[s])
        seg0 = seg0 | (row_ids == at)
        seg_idf = seg_idf + (row_ids >= at).astype(f32)
        start_vec = jnp.where(row_ids >= at, float(at), start_vec)
    ramp2 = (row_ids.astype(f32) - start_vec) * ge + seg_idf * SEG_M
    need_len = (not sw) or track_end
    lengths = lengths_ref[0] if need_len else None  # [1, B]

    @pl.when(is_first())
    def _init():
        if mode in (MODE_NW, MODE_HW):
            h_ref[:] = seg_idf * SEG_M - go     # H = -go - lr*Ge, ramped
        else:
            h_ref[:] = ramp2                    # H = 0, ramped
        e_ref[:] = ramp2 if sw else jnp.full((Q_pad, B), NEG, f32)
        if sw:
            m_ref[:] = ramp2                    # running max of H~
            if sw_end:
                c_ref[:] = jnp.zeros((Q_pad, B), f32)
        elif mode == MODE_OV:
            m_ref[:] = jnp.full((Q_pad, B), NEG, f32)  # H~ at lane end
        if not sw:
            tr_ref[:] = jnp.full(tr_ref.shape, NEG, f32)

    l32_ref[:] = letters_ref[0].astype(i32)

    chunk_has_end = None
    if mode == MODE_OV:
        t0 = chunk_t0()
        end_in_chunk = (lengths > t0) & (lengths <= t0 + TC)
        chunk_has_end = jnp.any(end_in_chunk)

    # Column-group loop (COL_UNROLL columns per iteration) with threaded
    # state, mirroring _kernel_body: per-cell VMEM round trips divide by
    # the group size, lean SW's running max fuses per group, and the
    # per-segment [1,B] tracker rows are CARRIED through the loop (loaded
    # from tr_ref once per chunk, written back once) instead of per-column
    # sub-tile read-modify-writes — the RMW the single kernel's carried
    # rows were measured to cost 15-20% of a column. The up-to-
    # (COL_UNROLL-1)-column ncols overshoot is unobservable (algebraic
    # padding + t < lengths guards; see _kernel_body).
    if sw:
        n_tr = 0  # per-cell m (+ c) carry the state; no per-column rows
    elif mode == MODE_NW:
        n_tr = n_seg
    else:  # HW / OV: score (+ argcol, + OV PLRM)
        n_tr = n_seg * ((3 if mode == MODE_OV else 2) if track_end else 1)
    if sw_end:
        st_refs = [m_ref, c_ref]
    elif mode == MODE_OV:
        st_refs = [m_ref]  # end-column snapshot (score-only uses it too)
    else:
        st_refs = []

    def column(tt, st, carry, snap=True):
        t = chunk_t0() + tt
        letters_t = l32_ref[pl.ds(tt, 1), :]
        onehot = (lane_a == letters_t).astype(jnp.bfloat16)
        Pp = jnp.dot(qp_ref[:], onehot, preferred_element_type=f32)  # P + Ge
        Ht, Et = st[0], st[1]
        Enew = jnp.maximum(Ht - go, Et - ge)
        if mode == MODE_NW:
            uH0 = (-go - t * ge).astype(f32)
            ul0 = jnp.where(t == 0, 0.0, uH0 + ge).astype(f32)
            c0 = jnp.maximum(uH0 - go, float(NEG - ge)).astype(f32)
        else:
            ul0 = jnp.asarray(0.0, f32)
            c0 = jnp.asarray(-go, f32)
        diag = pltpu.roll(Ht, 1, axis=0) + Pp
        diag = jnp.where(seg0, Pp + (ramp2 - ge) + ul0, diag)
        Hp = jnp.maximum(Enew, diag)
        if sw:
            Hp = jnp.maximum(Hp, ramp2)          # SW clamp, ramped
        X = pltpu.roll(Hp, 1, axis=0) + (ge - go)
        X = jnp.where(seg0, ramp2 + c0, X)
        k = 1
        while k < Q_pad:
            X = jnp.maximum(
                X, jnp.where(row_ids >= k, pltpu.roll(X, k, axis=0), NEG)
            )
            k *= 2
        Hnew = jnp.maximum(Hp, X)
        out_st = [Hnew, Enew]
        cv = list(carry)
        if sw:
            if sw_end:  # per-cell first-attainment column (see _kernel_body)
                out_st.append(jnp.maximum(st[2], Hnew))      # m
                out_st.append(jnp.where(                      # c
                    Hnew > st[2], t.astype(f32), st[3]))
            # lean SW: running max fuses in the group wrapper
        else:
            valid = t < lengths          # [1, B]
            is_end = t == lengths - 1    # [1, B]
            if mode == MODE_OV:
                out_st.append(
                    jnp.where(is_end, Hnew, st[2]) if snap else st[2])
            for s in range(n_seg):
                er = end_rows[s]
                lastrow = Hnew[er : er + 1, :]
                if mode == MODE_NW:
                    cv[s] = jnp.where(is_end, lastrow, cv[s])
                else:  # HW, OV: running last-row max (+ argcol / PLRM)
                    if mode == MODE_OV and track_end:
                        # PLRM: last-row max BEFORE this column's update,
                        # snapshotted at lane end (reference prevMaxLastRowH,
                        # src/opal.cpp:746,886-903)
                        cv[2 * n_seg + s] = jnp.where(
                            is_end, cv[s], cv[2 * n_seg + s])
                    lr_improved = valid & (lastrow > cv[s])
                    cv[s] = jnp.where(lr_improved, lastrow, cv[s])
                    if track_end:
                        cv[n_seg + s] = jnp.where(
                            lr_improved, t.astype(f32), cv[n_seg + s])
        return tuple(out_st), tuple(cv)

    def group(uu, carry, snap=True):
        st = (h_ref[:], e_ref[:]) + tuple(r[:] for r in st_refs)
        hs = []
        for j in range(COL_UNROLL):
            st, carry = column(COL_UNROLL * uu + j, st, carry, snap)
            hs.append(st[0])
        h_ref[:] = st[0]
        e_ref[:] = st[1]
        for j, r in enumerate(st_refs):
            r[:] = st[2 + j]
        if sw and not sw_end:
            m_ref[:] = jnp.maximum(
                m_ref[:], functools.reduce(jnp.maximum, hs))
        return carry

    def writeback(carry):
        for r in range(n_tr):
            tr_ref[pl.ds(r, 1), :] = carry[r]

    init = tuple(tr_ref[r : r + 1, :] for r in range(n_tr))
    # data-driven column count: skip the padding quantum's tail columns
    # on a block's last chunk (see _kernel_body's ncols note)
    n_cols = TC if ncols is None else ncols()
    n_groups = (n_cols + COL_UNROLL - 1) // COL_UNROLL
    if chunk_has_end is None:
        writeback(jax.lax.fori_loop(0, n_groups, group, init))
    else:
        @pl.when(chunk_has_end)
        def _loop_snap():
            writeback(jax.lax.fori_loop(
                0, n_groups, lambda uu, c: group(uu, c, True), init))

        @pl.when(jnp.logical_not(chunk_has_end))
        def _loop_lean():
            writeback(jax.lax.fori_loop(
                0, n_groups, lambda uu, c: group(uu, c, False), init))

    @pl.when(is_last())
    def _emit():
        def put(row, v):
            if out_i16:
                v = jnp.clip(v, -32768.0, 32767.0)
            out_ref[0, row : row + 1, :] = v.astype(out_ref.dtype)

        row_f = row_ids.astype(f32)
        if sw:
            mu_all = m_ref[:] - ramp2
        for s in range(n_seg):
            lo = int(starts[s])
            Qs = int(seg_qs[s])
            hi = lo + Qs  # real rows only (pad rows can only tie the max)
            off = float((Qs - 1) * ge + s * SEG_M)
            seg_mask = (row_ids >= lo) & (row_ids < hi)
            if sw:
                mu = jnp.where(seg_mask, mu_all, NEG)
                best = jnp.max(mu, axis=0, keepdims=True)
                put(s, best)
                if track_end:
                    # segmented (end_t, end_q) tie-break from (m, c), as in
                    # the single-query emit; local row = global - lo
                    lenf = lengths.astype(f32)
                    ok = (mu == best) & (c_ref[:] < lenf)
                    end_t = jnp.min(
                        jnp.where(ok, c_ref[:], float(2**30)),
                        axis=0, keepdims=True,
                    )
                    end_q = jnp.min(
                        jnp.where(ok & (c_ref[:] == end_t),
                                  row_f - lo, float(Q_pad)),
                        axis=0, keepdims=True,
                    )
                    put(n_seg + s, end_q)
                    put(2 * n_seg + s, end_t)
            elif mode == MODE_OV:
                v = tr_ref[s : s + 1] - off
                colmax = jnp.max(
                    jnp.where(seg_mask, m_ref[:] - ramp2, NEG),
                    axis=0, keepdims=True,
                )
                put(s, jnp.maximum(v, colmax))
                if track_end:
                    # end disambiguation per segment (see _kernel_body OV
                    # emit): end in the last column iff colmax beats PLRM
                    plrm = tr_ref[2 * n_seg + s : 2 * n_seg + s + 1] - off
                    cand = jnp.where(
                        seg_mask & ((m_ref[:] - ramp2) == colmax),
                        row_f - lo, float(Q_pad),
                    )
                    ovrow = jnp.min(cand, axis=0, keepdims=True)
                    in_last = colmax > plrm
                    put(n_seg + s,
                        jnp.where(in_last, ovrow, float(Qs - 1)))
                    put(2 * n_seg + s,
                        jnp.where(in_last, (lengths - 1).astype(f32),
                                  tr_ref[n_seg + s : n_seg + s + 1]))
            else:
                put(s, tr_ref[s : s + 1] - off)
                if track_end:
                    put(n_seg + s, jnp.full((1, B), float(Qs - 1), f32))
                    if mode == MODE_NW:
                        put(2 * n_seg + s, (lengths - 1).astype(f32))
                    else:  # HW: first-improvement column of the last row
                        put(2 * n_seg + s,
                            tr_ref[n_seg + s : n_seg + s + 1])


@functools.lru_cache(maxsize=None)
def build_pallas_multi_fn_raw(
    mode: int,
    seg_key: tuple,  # tuple of (q_real, q_pad) per segment
    go: int,
    ge: int,
    B: int = LANE_BLOCK,
    interpret: bool = False,
    out_i16: bool = False,
    track_end: bool = False,
):
    """Ragged-stream multi-query scorer (see _kernel_multi).

    fn(meta[6, C] i32, qp[Q_pad, A_PAD] bf16, letters[C, TC, B] i8,
    lengths[NB, 1, B] i32) -> trackers [NB, n_rows, B] with rows
    [scores | end_qs | end_ts] grouped per segment (ends only when
    track_end; OV's last-column / last-row merge happens at emit).
    seg_key carries (real, 16-quantized) query lengths per segment (the
    compile cache key)."""
    if ge > go:
        raise ValueError("pallas path requires gap_ext <= gap_open")
    if len(seg_key) > MULTI_MAX_SEGS:
        raise ValueError(f"too many stacked queries ({len(seg_key)})")
    seg_qs = tuple(k[0] for k in seg_key)
    seg_qpads = tuple(k[1] for k in seg_key)
    Q_pad = int(sum(seg_qpads))
    sw_end = mode == MODE_SW and track_end
    if Q_pad > max_q_pad(B, 4 if sw_end else 3):
        raise ValueError("stacked queries too long for lane width")
    n_seg = len(seg_qpads)
    n_rows = n_seg * (3 if track_end else 1)
    # per-segment tracker rows: score (+ argcol, PLRM when track_end),
    # padded to a full sublane tile
    trm = TR_ROWS if not track_end else max(TR_ROWS, _round_up(3 * n_seg, 8))

    def fn(meta, qp, letters, lengths):
        C = letters.shape[0]
        assert meta.shape == (6, C), meta.shape
        NB = lengths.shape[0]

        def kernel_wrapper(meta_ref, *refs):
            c = pl.program_id(0)

            @pl.when(meta_ref[4, c] == 1)  # skip inert padding chunks
            def _active():
                functools.partial(
                    _kernel_multi,
                    mode=mode, seg_qs=seg_qs, seg_qpads=seg_qpads,
                    Q_pad=Q_pad, TC=T_CHUNK, B=B, go=go, ge=ge,
                    track_end=track_end, out_i16=out_i16,
                    is_first=lambda: meta_ref[1, c] == 1,
                    is_last=lambda: meta_ref[2, c] == 1,
                    chunk_t0=lambda: meta_ref[3, c],
                    ncols=lambda: meta_ref[5, c],
                )(*refs)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((Q_pad, A_PAD), lambda c, m: (0, 0)),
                pl.BlockSpec((1, T_CHUNK, B), lambda c, m: (c, 0, 0)),
                pl.BlockSpec((1, 1, B), lambda c, m: (m[0, c], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, n_rows, B),
                                   lambda c, m: (m[0, c], 0, 0)),
            scratch_shapes=(
                [pltpu.VMEM((Q_pad, B), jnp.float32)] * (4 if sw_end else 3)
                + [pltpu.VMEM((T_CHUNK, B), jnp.int32),
                   pltpu.VMEM((trm, B), jnp.float32)]
            ),
        )
        return pl.pallas_call(
            kernel_wrapper,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (NB, n_rows, B), jnp.int16 if out_i16 else jnp.int32
            ),
            compiler_params=_compiler_params(interpret),
            interpret=interpret,
        )(meta, qp, letters, lengths)

    return jax.jit(fn)


def prepare_qp_multi(qprofiles, ge: int):
    """Stack query profiles ([A, Q_i] ints) into one [Q_pad, A_PAD] f32
    P + Ge operand with PAD_NEG padding; each segment's rows are 16-quantized
    (cache-friendly). Returns (qp, seg_qpads, seg_qs)."""
    seg_qpads = []
    seg_qs = []
    for qprofile in qprofiles:
        A, Qi = qprofile.shape
        if A > PAD_LETTER:
            raise ValueError(f"alphabet too large for pallas path ({A})")
        seg_qs.append(Qi)
        seg_qpads.append(_round_up(max(Qi, 16), 16))
    Q_pad = int(sum(seg_qpads))
    qp = np.full((Q_pad, A_PAD), float(PAD_NEG), dtype=np.float32)
    off = 0
    for qprofile, qpad in zip(qprofiles, seg_qpads):
        A, Qi = qprofile.shape
        qp[off : off + Qi, :A] = (
            np.asarray(qprofile, dtype=np.float32).T + float(ge)
        )
        off += qpad
    return qp, tuple(seg_qpads), seg_qs


def prepare_qp(qprofile: np.ndarray, ge: int) -> np.ndarray:
    """Build the kernel's query-profile operand from qprofile [A, Q] int:
    [Q_pad, A_PAD] f32 holding P + Ge, with PAD_NEG in padding rows and
    letter columns (incl. the reserved PAD_LETTER) so padded DP cells can
    never strictly beat real cells. Cast to bf16 before feeding the kernel
    (all values are bf16-exact)."""
    A, Q = qprofile.shape
    if A > PAD_LETTER:
        raise ValueError(f"alphabet too large for pallas path ({A} > 31)")
    Q_pad = _round_up(max(Q, 16), 16)
    qp = np.full((Q_pad, A_PAD), float(PAD_NEG), dtype=np.float32)
    qp[:Q, :A] = np.asarray(qprofile, dtype=np.float32).T + float(ge)
    return qp


@functools.lru_cache(maxsize=None)
def build_pallas_score_fn(*args, **kw):
    """Jitted single-group scorer (see build_pallas_score_fn_raw)."""
    return jax.jit(build_pallas_score_fn_raw(*args, **kw))


def finalize_trackers(tr: np.ndarray, mode, search_type, Q, lengths,
                      with_flags: bool = False):
    """Convert emitted tracker rows into score/end outputs (host side).
    tr: [n_rows, B] where rows follow tracker_rows(mode, search_type)."""
    track_end = search_type != SEARCH_SCORE
    rows = tracker_rows(mode, search_type, with_flags)
    row = {r: tr[j] for j, r in enumerate(rows)}
    out = {}
    if mode == MODE_SW:
        out["score"] = row[TR_BEST]
        if track_end:
            out["end_q"] = row[TR_BEST_R]
            out["end_t"] = row[TR_BEST_C]
    elif mode == MODE_NW:
        out["score"] = row[TR_NW]
        if track_end:
            out["end_q"] = np.full_like(row[TR_NW], Q - 1)
            out["end_t"] = lengths - 1
    elif mode == MODE_HW:
        out["score"] = row[TR_BEST]
        if track_end:
            out["end_q"] = np.full_like(row[TR_BEST], Q - 1)
            out["end_t"] = row[TR_BEST_C]
    else:  # OV (score/end disambiguation already done on device at emit)
        out["score"] = row[TR_BEST]
        if track_end:
            out["end_q"] = row[TR_BEST_R]
            out["end_t"] = row[TR_BEST_C]
    if with_flags:
        if mode == MODE_SW:
            out["max_ulhp"] = row[TR_ULHP]
        else:
            out["min_e"] = row[TR_MIN_E]
            out["min_f"] = row[TR_MIN_F]
            out["max_h"] = row[TR_MAX_H]
    return out
