/* Banded alignment-reconstruction DP + backtrace for opal_tpu.
 *
 * C twin of traceback.find_alignment (itself a port of the reference's
 * findAlignment, reference: src/opal.cpp:1236-1431): NW-anchored banded DP
 * with mode-specific stop rules and early stop at score_limit, then a
 * backtrace preferring E over F over the diagonal on ties. The per-pair
 * work is small, irregular and early-stopping — host territory — but
 * NumPy's per-column call overhead dominates in Python, hence this C hot
 * path (~100x faster per pair). Semantics identical to the Python fallback.
 *
 * Memory: unlike the reference, which stores the full Q*T cell matrix
 * (src/opal.cpp:1263 — its main long-sequence scaling weakness, see
 * SURVEY.md §5), storage here is band-relative when the band is narrower
 * than the matrix: cell (r, c) lives at ((r - c*step + off)*T + c) with
 * (step=1, off=top, rows=top+bottom+1) banded or (step=0, off=0, rows=Q)
 * full. O(band * T) instead of O(Q * T), bit-identical outputs.
 *
 * Sentinel: LSB = INT32_MIN/2 + max(go, ge). Derived values are
 * LSB - k*ge - j*go with bounded k, j, so no wraparound is possible (unlike
 * the reference's INT_MIN-based sentinel, which wraps when go == ge);
 * equality comparisons between sentinel-derived values are invariant under
 * the sentinel shift, so outputs match the reference wherever it is
 * well-defined.
 *
 * Returns 0 on success, -1 if the end location is not found (caller falls
 * back), -2 if the backtrace fails.
 */
#include <stdint.h>
#include <string.h>

#define MODE_NW 0
#define MODE_HW 1
#define MODE_OV 2
#define MODE_SW 3

#define OP_MATCH 0
#define OP_DEL 1
#define OP_INS 2
#define OP_MISMATCH 3

static inline int32_t max32(int32_t a, int32_t b) { return a > b ? a : b; }

int64_t opal_find_alignment(
    const uint8_t *query, int64_t Q, const uint8_t *target, int64_t T,
    int32_t go, int32_t ge, const int32_t *matrix, int64_t alpha,
    int32_t score_limit, int32_t mode, int64_t bottom, int64_t top,
    int64_t step, int64_t off,               /* storage mapping (see above) */
    int32_t *Hm, int32_t *Em, int32_t *Fm,   /* [rows*T] work */
    int32_t *out_score, int64_t *out_end_q, int64_t *out_end_t,
    uint8_t *out_ops, int64_t *out_ops_len)
{
    const int32_t INT32_MIN_HALF = -(int32_t)1073741824; /* -2^30 */
    const int32_t LSB = INT32_MIN_HALF + (go > ge ? go : ge);
    const int32_t NEGINF = INT32_MIN_HALF;

#define IDX(r, c) (((r) - (c) * step + off) * T + (c))

    /* initial column (virtual column -1) */
    /* prevH[r] = -go - r*ge ; prevE[r] = LSB */

    int32_t max_score = NEGINF;
    int32_t H_last = NEGINF;
    int64_t c;
    for (c = 0; c < T && max_score < score_limit; c++) {
        int64_t rs = c - top; if (rs < 0) rs = 0;
        int64_t re = c + bottom; if (re > Q - 1) re = Q - 1;
        int32_t uF, uH, ulH;
        if (rs == 0) {
            uF = LSB;
            uH = (int32_t)(-go - (int64_t)c * ge);
            ulH = (c == 0) ? 0 : uH + ge;
        } else {
            uH = uF = LSB;
            if (c == 0) {
                ulH = (int32_t)(-go - (int64_t)(rs - 1) * ge);
            } else {
                int64_t prs = (c - 1) - top; if (prs < 0) prs = 0;
                int64_t pre = (c - 1) + bottom; if (pre > Q - 1) pre = Q - 1;
                ulH = (rs - 1 >= prs && rs - 1 <= pre)
                          ? Hm[IDX(rs - 1, c - 1)] : LSB;
            }
        }
        const int32_t *mrow_base = matrix;
        unsigned char tc_letter = target[c];
        for (int64_t r = rs; r <= re; r++) {
            int32_t pH, pE;
            if (c == 0) {
                pH = (int32_t)(-go - (int64_t)r * ge);
                pE = LSB;
            } else {
                /* out-of-band cells of the previous column read as LSB */
                int64_t prs = (c - 1) - top; if (prs < 0) prs = 0;
                int64_t pre = (c - 1) + bottom; if (pre > Q - 1) pre = Q - 1;
                if (r < prs || r > pre) { pH = LSB; pE = LSB; }
                else { pH = Hm[IDX(r, c - 1)]; pE = Em[IDX(r, c - 1)]; }
            }
            int32_t E = max32(pH - go, pE - ge);
            int32_t F = max32(uH - go, uF - ge);
            int32_t s = mrow_base[(int64_t)query[r] * alpha + tc_letter];
            int32_t H = max32(E, max32(F, ulH + s));
            if (mode == MODE_SW || (mode == MODE_OV && c == T - 1)) {
                if (H > max_score) max_score = H;
            }
            uF = F; uH = H;
            /* ulH for next row = prev column H at row r (or boundary) */
            if (c == 0) ulH = (int32_t)(-go - (int64_t)r * ge);
            else {
                int64_t prs = (c - 1) - top; if (prs < 0) prs = 0;
                int64_t pre = (c - 1) + bottom; if (pre > Q - 1) pre = Q - 1;
                ulH = (r < prs || r > pre) ? LSB : Hm[IDX(r, c - 1)];
            }
            Hm[IDX(r, c)] = H;
            Em[IDX(r, c)] = E;
            Fm[IDX(r, c)] = F;
            H_last = H;
        }
        /* out-of-band rows of this column read as LSB lazily (see pH/pE). */
        if (mode == MODE_HW || mode == MODE_OV) {
            if (H_last > max_score) max_score = H_last;
        }
    }
    int64_t last_col = c - 1;

    int32_t score;
    int64_t end_q, end_t;
    if (mode == MODE_NW) {
        score = H_last; end_t = T - 1; end_q = Q - 1;
    } else if (mode == MODE_HW) {
        score = max_score; end_t = last_col; end_q = Q - 1;
    } else { /* SW, OV */
        score = max_score; end_t = last_col;
        int64_t rs = last_col - top; if (rs < 0) rs = 0;
        int64_t re = last_col + bottom; if (re > Q - 1) re = Q - 1;
        end_q = -1;
        for (int64_t r = rs; r <= re; r++) {
            if (Hm[IDX(r, last_col)] == max_score) { end_q = r; break; }
        }
        if (end_q < 0) return -1;
    }

    /* backtrace; fields: 0=H, 1=E, 2=F */
    int64_t r = end_q, cc = end_t, n = 0;
    int field = 0;
    while (r >= 0 && cc >= 0) {
        /* in-band check: out-of-band cells behave as LSB everywhere */
        int64_t rs = cc - top; if (rs < 0) rs = 0;
        int64_t re = cc + bottom; if (re > Q - 1) re = Q - 1;
        int in_band = (r >= rs && r <= re);
        int32_t vH = in_band ? Hm[IDX(r, cc)] : LSB;
        int32_t vE = in_band ? Em[IDX(r, cc)] : LSB;
        int32_t vF = in_band ? Fm[IDX(r, cc)] : LSB;
        if (field == 0) {
            if (vH == vE) field = 1;
            else if (vH == vF) field = 2;
            else {
                out_ops[n++] = (query[r] == target[cc]) ? OP_MATCH : OP_MISMATCH;
                r--; cc--;
            }
        } else if (field == 1) {
            if (cc > 0) {
                int64_t prs = (cc - 1) - top; if (prs < 0) prs = 0;
                int64_t pre = (cc - 1) + bottom; if (pre > Q - 1) pre = Q - 1;
                int32_t lH = (r >= prs && r <= pre) ? Hm[IDX(r, cc - 1)] : LSB;
                field = (vE == lH - go) ? 0 : 1;
            }
            out_ops[n++] = OP_INS;
            cc--;
        } else {
            if (r > 0) {
                int32_t upH = (r - 1 >= rs && r - 1 <= re)
                                  ? Hm[IDX(r - 1, cc)] : LSB;
                field = (vF == upH - go) ? 0 : 2;
            }
            out_ops[n++] = OP_DEL;
            r--;
        }
        if (n > Q + T) return -2;
    }
    while (r >= 0) { out_ops[n++] = OP_DEL; r--; }
    while (cc >= 0) { out_ops[n++] = OP_INS; cc--; }

    /* reverse ops in place */
    for (int64_t i = 0; i < n / 2; i++) {
        uint8_t tmp = out_ops[i];
        out_ops[i] = out_ops[n - 1 - i];
        out_ops[n - 1 - i] = tmp;
    }
    *out_score = score;
    *out_end_q = end_q;
    *out_end_t = end_t;
    *out_ops_len = n;
    return 0;
#undef IDX
}
