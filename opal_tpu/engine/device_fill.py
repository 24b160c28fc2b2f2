"""Batched banded alignment fill + backtrace walk on the TPU (VERDICT r3 #5).

The alignment stage reconstructs paths for the top-K winners with the
reverse-pair trick: per pair, a banded NW-boundary DP over the REVERSED
prefixes (query[:end_q+1][::-1] vs target[:end_t+1][::-1]) whose end is
the forward start (reference: src/opal.cpp:1475-1504, fill semantics
src/opal.cpp:1236-1431). The host C fill (_native/banded_align.c) runs
at ~1.33 G cells/s on one core; on hosts without spare cores the fill —
not the O(path) backtrace walk — is the alignment bottleneck.

This module batches K such fills into ONE device pass: pairs are lanes
of a [Q_pad, B] int32 column scan (lax.scan over target columns, exactly
the portable twin's shape, engine/xla.py), each lane carrying its own
band, score limit and lengths. Instead of DP values, the fill records
per cell the four DECISION BITS the backtrace walk consumes:

  bit0  H == E            (walk: prefer E on ties, src/opal.cpp:1376)
  bit1  H == F            (then F, then the diagonal)
  bit2  E == H(left) - Go (gap-open vs gap-extend into E)
  bit3  F == H(up)   - Go (same for F)

(bit4 additionally records whether the diagonal substitution is a MATCH,
so the walk touches no letter arrays) plus per-lane (score, end) trackers
replicating find_alignment's early-stop column and
first-row-in-last-column tie rules per mode. The [Tp, Qp, B] bit matrix
NEVER leaves the device: the backtrace walk runs on device too, as a
lockstep lax.scan across lanes (per lane the walk is sequential; across
lanes it is data-parallel) with field switches fused into the first
emission of the run they start — every live step emits one op, so
Qp+Tp+4 steps suffice. The host downloads only the base-5-packed op
codes (2 per byte, [steps//2, B]) — O(path length) per pair, not
O(cells) — unpacks/compacts them, and replay-validates every path.
All groups dispatch before any result is fetched (async), so later
groups' fills overlap earlier groups' downloads.

Bit-exactness: all comparisons are computed from values that equal
traceback.find_alignment's cell-by-cell — out-of-band cells are masked
to the same LSB sentinel its ``_read`` returns, the per-column max-plus
F rewrite is the same exact identity (valid for gap_ext <= gap_open,
which alignment requires by design), and the band seeds the F chain
with the same boundary the banded loop uses. The walk takes the
identical branch at every cell (same tie order, same manual border
indels, src/opal.cpp:1400-1409); every reconstructed path is
replay-validated, and any lane that fails validation (or has no
closed-form band) falls back to the per-pair host path. Replay
validation pins (score, start, end, path validity); the branch-order
argument above is what pins the path ITSELF to the host one, and
``OPAL_TPU_DEVICE_FILL_CHECK=1`` audits that claim at runtime by
recomputing every device-filled lane on the host path and demanding
bit-identity (mismatches warn and fall back to host).
"""
from __future__ import annotations

import functools

import numpy as np

from ..bandmath import band_borders
from ..constants import (
    ALIGN_DEL,
    ALIGN_INS,
    ALIGN_MATCH,
    ALIGN_MISMATCH,
    MODE_HW,
    MODE_NW,
    MODE_OV,
    MODE_SW,
)

LSB = -(1 << 30)       # -inf sentinel (int32, headroom for -Go/-Ge algebra)
NEG2 = LSB - (1 << 24)  # strictly dominated filler for the F-chain scan
BIGR = 1 << 24          # "no row found" marker in the end_q search

# Device-value safety bound: real DP values must stay far from the LSB
# algebra; |score| and per-column chain offsets must fit int32.
VALUE_BOUND = 1 << 28

# f32 lane: ~2x int32 VPU throughput on TPU (CLAUDE.md measurement).
# f32 arithmetic on integer-valued operands is EXACT while every
# intermediate stays below 2^24 in magnitude; with the f32 sentinels
# below (|NEG2_F| + ramp + penalties < 2^24) that holds whenever real
# DP values and the F-chain ramp stay under 2^21, so groups within
# F32_BOUND run the whole fill in f32 and larger ones keep int32.
LSB_F = -(1 << 23)
NEG2_F = -(1 << 23) - (1 << 21)
F32_BOUND = 1 << 21


@functools.lru_cache(maxsize=None)
def _fill_walk_fn(mode: int, Qp: int, Tp: int, B: int, interpret: bool,
                  use_f32: bool = False):
    """Jitted batched fill + walk. Returns (score [B], rend_q [B],
    rend_t [B], ok [B], codes [steps, B] uint8) where codes holds
    op+1 per walk step in FORWARD alignment order (the walk of the
    reversed problem emits the original problem's ops front to back),
    0 = no emission that step.

    use_f32 runs the DP state in f32 (~2x int32 VPU throughput); the
    caller guarantees every value stays integer-exact (F32_BOUND)."""
    import jax
    import jax.numpy as jnp

    dt = jnp.float32 if use_f32 else jnp.int32
    Lsb = LSB_F if use_f32 else LSB
    Neg2 = NEG2_F if use_f32 else NEG2

    # every walk step emits one op (field switches are fused into the
    # first emission of the run they start), so ops <= Qp+Tp+2 bounds it
    steps = Qp + Tp + 4

    def fill(aq, at, qlen, tlen, bottom, top, limit, go, ge, matrix):
        # aq [Qp, B] int32 letters, at [Tp, B]; per-lane int32 params.
        god = go.astype(dt)
        ged = ge.astype(dt)
        limd = limit.astype(dt)
        ridx = jnp.arange(Qp, dtype=jnp.int32)[:, None]      # [Qp, 1]
        qmask = ridx < qlen[None, :]                          # [Qp, B]
        prof = matrix[aq]                                     # [Qp, B, A]

        def col(carry, c):
            prevH, prevE, m, last_col, endq, h_last = carry
            c = c.astype(jnp.int32)
            letters = at[c]                                   # [B]
            P = jnp.take_along_axis(
                prof, letters[None, :, None].astype(jnp.int32), axis=2
            )[:, :, 0]                                        # [Qp, B]

            col_live = c < tlen                               # [B]
            in_band = (
                qmask
                & col_live[None, :]
                & (ridx >= c - top[None, :])
                & (ridx <= c + bottom[None, :])
            )

            bnd_uH = -god - c.astype(dt) * ged  # NW boundary H(-1, c)
            ulH0 = jnp.where(c == 0, jnp.zeros((), dt), bnd_uH + ged)
            E = jnp.maximum(prevH - god, prevE - ged)
            ulH = jnp.concatenate(
                [jnp.full((1, B), ulH0, dt), prevH[:-1]], axis=0)
            Hp = jnp.maximum(E, ulH + P)
            Hp_m = jnp.where(in_band, Hp, Lsb)

            # F chain (exact max-plus prefix rewrite, ge <= go). The
            # chain seeds uF = LSB exactly where find_alignment does: at
            # the first in-band row of the column (row 0's real boundary,
            # or the band edge when the band starts below row 0).
            above_out = jnp.concatenate(
                [jnp.ones((1, B), bool), ~in_band[:-1]], axis=0)
            seed = jnp.where(in_band & above_out, Lsb - ged, Neg2)
            c_top = jnp.where(
                jnp.arange(Qp)[:, None] == 0,
                bnd_uH - god,
                jnp.concatenate(
                    [jnp.full((1, B), Neg2, dt), Hp_m[:-1] - god],
                    axis=0),
            )
            C = jnp.where(in_band, jnp.maximum(c_top, seed), Neg2)
            rg = (ridx * ge).astype(dt)
            F = jax.lax.cummax(C + rg, axis=0) - rg
            Hcol = jnp.maximum(Hp, F)

            H_m = jnp.where(in_band, Hcol, Lsb)
            E_m = jnp.where(in_band, E, Lsb)
            F_m = jnp.where(in_band, F, Lsb)
            uh = jnp.concatenate(
                [jnp.full((1, B), Lsb, dt), H_m[:-1]], axis=0)
            bits = (
                (H_m == E_m).astype(jnp.uint8)
                | ((H_m == F_m).astype(jnp.uint8) << 1)
                | ((E_m == prevH - god).astype(jnp.uint8) << 2)
                | ((F_m == uh - god).astype(jnp.uint8) << 3)
                # bit4: diagonal substitution is a MATCH at this cell —
                # precomputed here so the walk needs no letter gathers
                | ((aq == letters[None, :]).astype(jnp.uint8) << 4)
            )

            # trackers: find_alignment's loop guard is
            # `while c < T and max_score < score_limit`, so a column
            # executes iff the PRE-column max is still below the limit.
            if mode == MODE_NW:
                active = col_live
            else:
                active = col_live & (m < limd)
            re = jnp.clip(jnp.minimum(qlen - 1, c + bottom), 0, Qp - 1)
            empty = (c - top > jnp.minimum(qlen - 1, c + bottom)) | ~col_live
            gath = jnp.take_along_axis(H_m, re[None, :], axis=0)[0]
            h_last_new = jnp.where(active & ~empty, gath, h_last)

            colmax = jnp.max(jnp.where(in_band, Hcol, Neg2), axis=0)
            if mode == MODE_SW:
                cand = colmax
                upd = active & ~empty
            elif mode == MODE_HW:
                cand = h_last_new
                upd = active
            elif mode == MODE_OV:
                cand = jnp.maximum(
                    h_last_new,
                    jnp.where((c == tlen - 1) & ~empty, colmax, Neg2))
                upd = active
            else:  # NW: no early stop, score read from h_last at the end
                cand = jnp.full((), Neg2, dt)
                upd = jnp.zeros((B,), bool)
            m_new = jnp.where(upd, jnp.maximum(m, cand), m)

            # first in-band row equal to the (updated) max — evaluated
            # every executed column, keeping the LAST executed column's
            # answer = find_alignment's end search in its last column.
            hit = in_band & (Hcol == m_new[None, :])
            first = jnp.min(
                jnp.where(hit, jnp.arange(Qp)[:, None], BIGR), axis=0)
            endq_new = jnp.where(active, first, endq)
            last_new = jnp.where(active, c, last_col)

            return (jnp.where(in_band, Hcol, Lsb), E_m, m_new,
                    last_new, endq_new, h_last_new), bits

        prevH0 = jnp.where(
            qmask, -god - (ridx * ge).astype(dt) * jnp.ones((1, B), dt),
            Lsb)
        prevE0 = jnp.full((Qp, B), Lsb, dt)
        init = (
            prevH0.astype(dt),
            prevE0,
            jnp.full((B,), Neg2, dt),          # running max
            jnp.zeros((B,), jnp.int32),        # last executed column
            jnp.full((B,), BIGR, jnp.int32),   # end_q candidate
            jnp.full((B,), Lsb, dt),           # H_last
        )
        (_, _, m, last_col, endq, h_last), dirs = jax.lax.scan(
            col, init, jnp.arange(Tp, dtype=jnp.int32))
        score = h_last if mode == MODE_NW else m
        return dirs, score.astype(jnp.int32), last_col, endq

    def walk(dirs, r0, c0):
        # Lockstep backtrace over the device-resident decision bits,
        # mirroring traceback.find_alignment's walk exactly (tie order
        # E -> F -> diagonal; manual border indels once one coordinate
        # is exhausted). Lanes with r0 = c0 = -1 emit nothing.
        #
        # Field switches are FUSED into the first emission of the run
        # they start (entering E from H emits that INS in the same step,
        # using this cell's open bit — identical to the two-step original
        # since the switch step never moved), so EVERY live step emits
        # one op: the scan is Qp+Tp+4 steps, half the unfused bound, and
        # the per-step cost is ONE dirs gather (bit4 carries the
        # match/mismatch distinction, so no letter gathers).
        lanes = jnp.arange(B, dtype=jnp.int32)

        def step(carry, _):
            r, c, field = carry
            inside = (r >= 0) & (c >= 0)
            bits = jnp.where(
                inside,
                dirs[jnp.clip(c, 0, Tp - 1), jnp.clip(r, 0, Qp - 1), lanes],
                0).astype(jnp.int32)
            b0 = (bits & 1) != 0
            b1 = (bits & 2) != 0
            b2 = (bits & 4) != 0
            b3 = (bits & 8) != 0
            is_match = (bits & 16) != 0

            fH = inside & (field == 0)
            fE = inside & (field == 1)
            fF = inside & (field == 2)
            ins_step = fE | (fH & b0)            # E run: emit INS now
            del_step = fF | (fH & ~b0 & b1)      # F run: emit DEL now
            diag = fH & ~b0 & ~b1
            e_open = ins_step & b2 & (c > 0)
            f_open = del_step & b3 & (r > 0)

            bdel = (~inside) & (r >= 0)
            bins = (~inside) & (r < 0) & (c >= 0)

            sub = jnp.where(is_match, ALIGN_MATCH, ALIGN_MISMATCH)
            code = jnp.where(
                diag, sub + 1,
                jnp.where(ins_step | bins, ALIGN_INS + 1,
                          jnp.where(del_step | bdel, ALIGN_DEL + 1, 0)))

            field = jnp.where(ins_step, 1, field)
            field = jnp.where(del_step, 2, field)
            field = jnp.where(e_open | f_open | diag, 0, field)
            r = r - (diag | del_step | bdel).astype(jnp.int32)
            c = c - (diag | ins_step | bins).astype(jnp.int32)
            return (r, c, field), code.astype(jnp.uint8)

        init = (r0, c0, jnp.zeros((B,), jnp.int32))
        _, codes = jax.lax.scan(step, init, None, length=steps)
        # pack 2 codes/byte (values 0..4 -> base-5 pair) — halves the
        # O(path) download, the decode is one divmod on host
        return codes[0::2] * 5 + codes[1::2]  # [steps//2, B]

    def run(aq, at, qlen, tlen, bottom, top, limit, go, ge, matrix):
        import jax.numpy as jnp

        dirs, score, last_col, endq = fill(
            aq, at, qlen, tlen, bottom, top, limit, go, ge, matrix)
        # per-lane end coordinates per find_alignment's mode rules
        if mode == MODE_NW:
            rend_q, rend_t = qlen - 1, tlen - 1
            ok = score == limit
        elif mode == MODE_HW:
            rend_q, rend_t = qlen - 1, last_col
            ok = score == limit
        else:  # SW / OV
            rend_q, rend_t = endq, last_col
            ok = (score == limit) & (endq < BIGR)
        ok = ok & (rend_q >= 0) & (rend_q < qlen)
        codes = walk(dirs,
                     jnp.where(ok, rend_q, -1),
                     jnp.where(ok, rend_t, -1))
        return score, rend_q, rend_t, ok, codes

    import jax

    return jax.jit(run) if not interpret else run


def _round_up(x, q):
    return -(-x // q) * q


def align_winners_device(query, db_list, gap_open, gap_ext, matrix,
                         mode, winners, lanes=512, interpret=False):
    """Batched device reconstruction for `winners`:
    [(index, score, end_q, end_t), ...]. Returns {index: (start_q,
    start_t, ops)} for every winner the device path reconstructed and
    replay-validated; callers run the host per-pair path for the rest.
    """
    from ..traceback import _replay_batch

    query = np.asarray(query, np.uint8)
    m = np.asarray(matrix, np.int64)
    Go, Ge = int(gap_open), int(gap_ext)
    if Ge > Go or (Go == 0 and Ge == 0):
        return {}
    M = int(m.max())

    jobs = []
    for i, score, eq, et in winners:
        if eq < 0 or et < 0:
            continue
        aq = query[: eq + 1][::-1]
        at = np.asarray(db_list[i], np.uint8)[: et + 1][::-1]
        try:
            bottom, top = band_borders(score, mode, len(aq), len(at),
                                       Go, Ge, M)
        except ZeroDivisionError:
            continue
        if not (0 <= bottom < len(aq) and 0 <= top < len(at)):
            continue
        vb = abs(int(score)) + (len(aq) + len(at)) * (abs(M) + Go + Ge)
        if vb >= VALUE_BOUND:
            continue
        jobs.append((i, int(score), aq, at, bottom, top, vb))
    if not jobs:
        return {}

    import os as _os
    import time as _time

    f32_env = _os.environ.get("OPAL_TPU_DEVICE_FILL_F32")
    stats = _os.environ.get("OPAL_TPU_DEVICE_FILL_STATS") == "1"
    t_pack = t_dev = t_replay = 0.0
    groups = []
    mat_dev = {}
    out = {}
    # bucket by padded shape to bound compile count and padding waste
    jobs.sort(key=lambda j: (len(j[2]), len(j[3])))
    # Phase 1: pack + DISPATCH every group (jax dispatch is async), so
    # group k+1's fill computes while group k's results download — the
    # per-group sync round trips of the serial loop measurably dominated
    # on the tunneled link.
    pending = []
    for g0 in range(0, len(jobs), lanes):
        group = jobs[g0 : g0 + lanes]
        t0 = _time.perf_counter()
        B = len(group)
        Qp = _round_up(max(len(j[2]) for j in group), 64)
        Tp = _round_up(max(len(j[3]) for j in group), 64)
        aqs = np.zeros((Qp, B), np.int32)
        ats = np.zeros((Tp, B), np.int32)
        qlen = np.zeros(B, np.int32)
        tlen = np.zeros(B, np.int32)
        bot = np.zeros(B, np.int32)
        top_ = np.zeros(B, np.int32)
        lim = np.zeros(B, np.int32)
        for k, (i, score, aq, at, b, t, _vb) in enumerate(group):
            aqs[: len(aq), k] = aq
            ats[: len(at), k] = at
            qlen[k], tlen[k] = len(aq), len(at)
            bot[k], top_[k], lim[k] = b, t, score

        use_f32 = max(j[6] for j in group) < F32_BOUND
        if f32_env in ("0", "1"):
            use_f32 = use_f32 and f32_env == "1"

        import jax.numpy as jnp

        dtt = jnp.float32 if use_f32 else jnp.int32
        if dtt not in mat_dev:
            mat_dev[dtt] = jnp.asarray(m, dtt)
        fn = _fill_walk_fn(mode, Qp, Tp, B, interpret, use_f32)
        handles = fn(
            jnp.asarray(aqs), jnp.asarray(ats), jnp.asarray(qlen),
            jnp.asarray(tlen), jnp.asarray(bot), jnp.asarray(top_),
            jnp.asarray(lim), jnp.int32(Go), jnp.int32(Ge), mat_dev[dtt])
        t_pack += _time.perf_counter() - t0
        groups.append((B, Qp, Tp))
        pending.append((group, handles))

    # Phase 2: fetch (O(path) download: packed [steps//2, B] op codes +
    # per-lane scalars) and replay-validate on host. Kick off every
    # device->host copy before blocking on the first, so later groups'
    # transfers overlap this group's replay work.
    for _, handles in pending:
        for h in handles:
            if hasattr(h, "copy_to_host_async"):
                h.copy_to_host_async()
    for group, (score_d, rend_q, rend_t, ok, codes) in pending:
        t1 = _time.perf_counter()
        codes = np.asarray(codes)
        rend_q = np.asarray(rend_q)
        rend_t = np.asarray(rend_t)
        ok = np.asarray(ok)
        t2 = _time.perf_counter()
        t_dev += t2 - t1

        oks = np.flatnonzero(ok)
        if oks.size == 0:
            continue
        # vectorized base-5 unpack + per-lane compaction for every ok
        # lane at once. Walk emission order IS forward alignment order
        # (the walk runs end->start of the REVERSED problem); 0 = no
        # emission.
        pairs = codes[:, oks].astype(np.int16)       # [steps//2, L]
        up = np.empty((pairs.shape[0] * 2, oks.size), np.uint8)
        up[0::2] = pairs // 5
        up[1::2] = pairs % 5
        lanes_ops = np.ascontiguousarray(up.T)       # [L, steps]
        nz = lanes_ops != 0
        counts = nz.sum(1)
        cat_ops = lanes_ops[nz] - 1                  # lane-major concat
        per_lane = np.split(cat_ops, np.cumsum(counts)[:-1])

        sqs = np.empty(oks.size, np.int64)
        sts = np.empty(oks.size, np.int64)
        targets = []
        for j, k in enumerate(oks):
            i, score, aq, at, b, t, _vb = group[k]
            sqs[j] = len(aq) - int(rend_q[k]) - 1
            sts[j] = len(at) - int(rend_t[k]) - 1
            targets.append(np.asarray(db_list[i], np.uint8))
        got_s, got_rq, got_rt, valid = _replay_batch(
            query, targets, sqs, sts, cat_ops, counts, Go, Ge, m)
        for j, k in enumerate(oks):
            i, score, aq, at, b, t, _vb = group[k]
            if (valid[j] and got_s[j] == score
                    and got_rq[j] == len(aq) - 1
                    and got_rt[j] == len(at) - 1):
                out[i] = (int(sqs[j]), int(sts[j]), per_lane[j])
        if stats:
            t_replay += _time.perf_counter() - t2
    if stats:
        import sys as _sys

        cells = sum(b * q * t for b, q, t in groups)
        print(f"[device_fill] groups={len(groups)} "
              f"shapes={groups} padded_cells={cells/1e6:.1f}M "
              f"pack={t_pack*1e3:.0f}ms dev={t_dev*1e3:.0f}ms "
              f"replay={t_replay*1e3:.0f}ms", file=_sys.stderr, flush=True)
    return out
