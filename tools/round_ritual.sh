#!/usr/bin/env bash
# End-of-round evidence ritual (VERDICT r4 ask #8) — run before the final
# snapshot.  Regenerates every committed evidence artifact on the shipping
# tree and records the results; abort the snapshot if anything is red.
#
#   bash tools/round_ritual.sh [--skip-suite]
#
# 1. full CPU test suite (tests/conftest.py pins platform + determinism)
# 2. full benchmark report  -> bench_report.json   (all BASELINE configs)
# 3. corpus parity sweep    -> sweep_report.json   (152 oracle-gated rows)
# 4. corpus-scale pipeline  -> corpus_report.json  (BASELINE config #5)
# 5. multi-chip dry run     (8-device virtual mesh)
set -u
cd "$(dirname "$0")/.."
fail=0

if [ "${1:-}" != "--skip-suite" ]; then
    echo "=== [1/5] full test suite"
    python -m pytest tests/ -q || fail=1
fi

echo "=== [2/5] full bench -> bench_report.json"
SST_BENCH_FULL=1 python bench.py || fail=1

echo "=== [3/5] corpus parity sweep -> sweep_report.json"
python tools/sweep_corpus.py --samples --json sweep_report.json || fail=1

echo "=== [4/5] corpus-scale pipeline -> corpus_report.json"
(cd tools && python bench_corpus.py) || fail=1

echo "=== [5/5] multi-chip dry run"
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" || fail=1

if [ "$fail" -ne 0 ]; then
    echo "RITUAL RED — do not snapshot"; exit 1
fi
echo "RITUAL GREEN"
