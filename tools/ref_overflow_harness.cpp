// Differential-validation harness for the precision-cascade overflow
// flags (VERDICT r3 #6).
//
// The reference's per-stage overflow flag set is internal state: the
// `calculated[]` array searchDatabase_<Simd<T>, MODE> fills (true =
// finished without saturation overflow at that precision;
// /root/reference/src/opal.cpp:983-1021 escalates the rest). The public
// API only exposes the char SW set (opalSearchDatabaseCharSW) — the
// NW/HW/OV char/short sets and the SW short set are not observable from
// outside, so opal_tpu's analytic flags (opal_tpu/engine/cascade.py::
// classify_precision) could never be diffed against the reference's
// actual kernels. This harness #includes the reference source (same
// build recipe as tools/compare_vs_reference.py) to reach the internal
// stage functions directly and print each stage's flag set.
//
// Protocol (all ints, whitespace-separated, on stdin):
//   mode searchType gapOpen gapExt alphabetLen queryLen dbLen
//   scoreMatrix[alphabetLen * alphabetLen]
//   query[queryLen]                (letter codes)
//   then per sequence: len letters[len]
// Output: for each stage (SW: swChar swShort; else char short), one line
//   "stage <name> <0/1 per sequence>"  (1 = calculated without overflow)
// plus "score <...>" lines with the int-precision exact scores.
//
// This file is a TEST TOOL that drives reference code; nothing here is
// part of the opal_tpu framework.

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "opal.cpp"  // reference internals (static fns) — see above

static void printFlags(const char* name, const std::vector<char>& calc) {
    printf("stage %s", name);
    for (size_t i = 0; i < calc.size(); i++) printf(" %d", calc[i] ? 1 : 0);
    printf("\n");
}

int main() {
    int mode, searchType, gapOpen, gapExt, alphabetLen, queryLen, dbLen;
    if (scanf("%d %d %d %d %d %d %d", &mode, &searchType, &gapOpen,
              &gapExt, &alphabetLen, &queryLen, &dbLen) != 7)
        return 2;
    std::vector<int> scoreMatrix(alphabetLen * alphabetLen);
    for (int& v : scoreMatrix)
        if (scanf("%d", &v) != 1) return 2;
    std::vector<unsigned char> query(queryLen);
    for (int i = 0; i < queryLen; i++) {
        int v; if (scanf("%d", &v) != 1) return 2;
        query[i] = (unsigned char)v;
    }
    std::vector<std::vector<unsigned char>> seqs(dbLen);
    std::vector<unsigned char*> db(dbLen);
    std::vector<int> lens(dbLen);
    for (int i = 0; i < dbLen; i++) {
        int L; if (scanf("%d", &L) != 1) return 2;
        seqs[i].resize(L);
        for (int j = 0; j < L; j++) {
            int v; if (scanf("%d", &v) != 1) return 2;
            seqs[i][j] = (unsigned char)v;
        }
        db[i] = seqs[i].data();
        lens[i] = L;
    }

    std::vector<OpalSearchResult> results(dbLen);
    std::vector<OpalSearchResult*> rptr(dbLen);
    for (int i = 0; i < dbLen; i++) {
        opalInitSearchResult(&results[i]);
        rptr[i] = &results[i];
    }
    // std::vector<bool> has no data(); use char and a bool* view
    std::vector<char> calc(dbLen, 0);
    bool* calcB = reinterpret_cast<bool*>(calc.data());

    // Each stage runs on a FRESH flag array (the cascade would feed the
    // previous stage's survivors in; here every stage sees every
    // sequence so each per-stage flag set is complete).
    if (mode == OPAL_MODE_SW) {
        std::fill(calc.begin(), calc.end(), 0);
        searchDatabaseSW_<SimdSW<char>>(
            query.data(), queryLen, db.data(), dbLen, lens.data(),
            gapOpen, gapExt, scoreMatrix.data(), alphabetLen,
            rptr.data(), searchType, calcB, OPAL_OVERFLOW_SIMPLE);
        printFlags("swChar", calc);
        std::fill(calc.begin(), calc.end(), 0);
        searchDatabaseSW_<SimdSW<short>>(
            query.data(), queryLen, db.data(), dbLen, lens.data(),
            gapOpen, gapExt, scoreMatrix.data(), alphabetLen,
            rptr.data(), searchType, calcB, OPAL_OVERFLOW_SIMPLE);
        printFlags("swShort", calc);
        std::fill(calc.begin(), calc.end(), 0);
        searchDatabaseSW_<SimdSW<int>>(
            query.data(), queryLen, db.data(), dbLen, lens.data(),
            gapOpen, gapExt, scoreMatrix.data(), alphabetLen,
            rptr.data(), searchType, calcB, OPAL_OVERFLOW_SIMPLE);
    } else {
        #define RUN_STAGE(T, NAME)                                        \
            do {                                                          \
                std::fill(calc.begin(), calc.end(), 0);                   \
                int rc = 0;                                               \
                if (mode == OPAL_MODE_NW)                                 \
                    rc = searchDatabase_<Simd<T>, OPAL_MODE_NW>(          \
                        query.data(), queryLen, db.data(), dbLen,         \
                        lens.data(), gapOpen, gapExt, scoreMatrix.data(), \
                        alphabetLen, rptr.data(), searchType, calcB,      \
                        OPAL_OVERFLOW_SIMPLE);                            \
                else if (mode == OPAL_MODE_HW)                            \
                    rc = searchDatabase_<Simd<T>, OPAL_MODE_HW>(          \
                        query.data(), queryLen, db.data(), dbLen,         \
                        lens.data(), gapOpen, gapExt, scoreMatrix.data(), \
                        alphabetLen, rptr.data(), searchType, calcB,      \
                        OPAL_OVERFLOW_SIMPLE);                            \
                else                                                      \
                    rc = searchDatabase_<Simd<T>, OPAL_MODE_OV>(          \
                        query.data(), queryLen, db.data(), dbLen,         \
                        lens.data(), gapOpen, gapExt, scoreMatrix.data(), \
                        alphabetLen, rptr.data(), searchType, calcB,      \
                        OPAL_OVERFLOW_SIMPLE);                            \
                if (rc != 0 && rc != OPAL_ERR_OVERFLOW) {                 \
                    /* args out of range for this precision: the stage */ \
                    /* cannot run at all -> every sequence overflows */   \
                    std::fill(calc.begin(), calc.end(), 0);               \
                }                                                         \
                printFlags(NAME, calc);                                   \
            } while (0)
        RUN_STAGE(char, "char");
        RUN_STAGE(short, "short");
        std::fill(calc.begin(), calc.end(), 0);
        if (mode == OPAL_MODE_NW)
            searchDatabase_<Simd<int>, OPAL_MODE_NW>(
                query.data(), queryLen, db.data(), dbLen, lens.data(),
                gapOpen, gapExt, scoreMatrix.data(), alphabetLen,
                rptr.data(), searchType, calcB, OPAL_OVERFLOW_SIMPLE);
        else if (mode == OPAL_MODE_HW)
            searchDatabase_<Simd<int>, OPAL_MODE_HW>(
                query.data(), queryLen, db.data(), dbLen, lens.data(),
                gapOpen, gapExt, scoreMatrix.data(), alphabetLen,
                rptr.data(), searchType, calcB, OPAL_OVERFLOW_SIMPLE);
        else
            searchDatabase_<Simd<int>, OPAL_MODE_OV>(
                query.data(), queryLen, db.data(), dbLen, lens.data(),
                gapOpen, gapExt, scoreMatrix.data(), alphabetLen,
                rptr.data(), searchType, calcB, OPAL_OVERFLOW_SIMPLE);
    }
    printf("score");
    for (int i = 0; i < dbLen; i++)
        printf(" %d", results[i].scoreSet ? results[i].score : -999999);
    printf("\n");
    return 0;
}
