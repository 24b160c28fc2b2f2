#!/bin/bash
# One-shot hardware validation sweep: everything that must pass on the real
# TPU after kernel-affecting changes (the queue CLAUDE.md's verify skill and
# BENCH_REPORT cite). Run from the repo root once `jax.devices()` shows the
# chip. Each stage is timeout-bounded so a tunnel drop mid-sweep cannot hang
# the run; results accumulate in ${OUT:-/tmp/hw_validate}.
set -u
OUT=${OUT:-/tmp/hw_validate}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

FAILED=0
run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
    echo "PASS $name"
  else
    echo "FAIL $name (exit $?, see $OUT/$name.log)"
    tail -5 "$OUT/$name.log"
    FAILED=$((FAILED + 1))
  fi
}

run tpu_pytest      1800 env OPAL_TPU_HW_TESTS=1 python -m pytest tests/ -q -m tpu
run parity_large    3600 python tools/tpu_parity.py --large
run perf_x0         2400 python tools/perf.py
run perf_x1         2400 python tools/perf.py --search-type 1
run perf_multi      2400 python tools/perf.py --multi --repeats 2
run bench           1800 python bench.py
run ab_block        2400 python tools/ab_block.py
run soak_500        3600 python tools/soak.py --trials 500
# long-query pool: panel chains incl. x1 (score+end) — the combo whose
# VMEM blowup the short pool cannot reach (see CLAUDE.md panels note)
run soak_long_60    3600 python tools/soak.py --trials 60 --long
run compare_ref     2400 python tools/compare_vs_reference.py \
    /root/reference/test_data/query/P19930.fasta \
    /root/reference/test_data/db/uniprot_sprot196.fasta -a SW -x 2

echo "=== done ($(date +%H:%M:%S)); $FAILED stage(s) failed; logs in $OUT ==="
grep -h . "$OUT"/bench.log 2>/dev/null | tail -1
exit "$FAILED"  # non-zero iff any stage failed, so wrappers can gate on it
