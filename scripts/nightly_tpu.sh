#!/usr/bin/env bash
# Nightly real-TPU verification: Mosaic kernels compiled on the chip (the CI
# suite runs them interpret-mode on CPU only — a Mosaic lowering regression
# would land green there, ROADMAP "Robustness") plus a bench smoke.
#
# Usage: scripts/nightly_tpu.sh [logdir]
# Writes logs to <logdir>/nightly_tpu_<date>.log (default: logs/).
# PYTHONPATH must keep the axon site dir (CLAUDE.md): the script sets it.
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-logs}
mkdir -p "$LOGDIR"
LOG="$LOGDIR/nightly_tpu_$(date +%Y%m%d_%H%M).log"
export PYTHONPATH="$PWD:/root/.axon_site"

{
  echo "=== nightly real-TPU run $(date -Is) ==="
  echo "--- pallas kernel suites (compiled on chip) ---"
  AM_TPU_TEST_REAL=1 timeout 3600 python -m pytest \
    tests/test_pallas_distance.py tests/test_pallas_model_kernels.py \
    tests/test_frontend_fused.py -q \
    | tee /tmp/nightly_pytest.out
  rc1=${PIPESTATUS[0]}
  echo "pallas suites rc=$rc1"
  echo "--- bench smoke (small set, warm cache) ---"
  BENCH_CLIPS=256 BENCH_CLIPS_HOST=64 timeout 3600 python bench.py \
    | tee /tmp/nightly_bench.out
  rc2=${PIPESTATUS[0]}
  echo "bench rc=$rc2"
  # one-line JSON summary (VERDICT r2 #6): pass/fail counts + smoke number
  python - "$rc1" "$rc2" <<'PYEOF'
import json, re, sys
rc1, rc2 = int(sys.argv[1]), int(sys.argv[2])
counts = {}
try:
    tail = open("/tmp/nightly_pytest.out").read()
    for n, what in re.findall(r"(\d+) (passed|failed|skipped|error)", tail):
        counts[what] = int(n)
except OSError:
    pass
smoke = None
try:
    for line in open("/tmp/nightly_bench.out"):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if "value" in d:
            smoke = d["value"]
except OSError:
    pass
print(json.dumps({
    "nightly": "ok" if (rc1 == 0 and rc2 == 0) else "FAIL",
    "pallas_rc": rc1, "bench_rc": rc2,
    **counts,
    "bench_smoke_clips_per_s": smoke,
}))
PYEOF
  echo "=== done $(date -Is) rc=$((rc1 || rc2)) ==="
  exit $((rc1 || rc2))
} 2>&1 | tee "$LOG"
exit "${PIPESTATUS[0]}"
