#!/usr/bin/env bash
# End-of-round snapshot ritual (VERDICT r5 item 2): never let an
# in-progress refactor be the round snapshot.  Run from the repo root
# BEFORE the final commit of a round:
#
#   bash tools/gate.sh            # full: pytest + full differential gate
#   bash tools/gate.sh --quick    # smoke: pytest + sf0.001 gate
#
# Exits non-zero if anything is red — in that case commit the last green
# state instead.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD"

SF_DIR=/root/testdata/sf0.01
if [[ "${1:-}" == "--quick" ]]; then
  SF_DIR=/root/testdata/sf0.001
fi

echo "== gate: pytest =="
python -m pytest tests/ -q

echo "== gate: differential oracle check ($SF_DIR) =="
python tools/diffcheck.py "$SF_DIR"

echo "== gate: entry smoke =="
python - <<'EOF'
import __spark_entry__ as m
from pg_mooncake_spark.session import get_spark

spark = get_spark()
rows = m.entry(spark).collect()
assert rows, "entry() returned no rows"
qs, os_ = m.queries(), m.oracle_sql()
extra = set(os_) - set(qs)
assert not extra, f"oracle_sql keys without queries(): {extra}"
print(f"entry ok: {len(rows)} rows; {len(qs)} queries, {len(os_)} oracles")
EOF

echo "== gate: ALL GREEN =="
