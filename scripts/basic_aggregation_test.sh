#!/bin/bash
# One-command distributed-query demo: two directory "nodes" on one box,
# full encode-flags -> per-node query -> encode-results -> aggregate
# protocol, with parity assertions — the analog of the reference's
# scripts/basic_aggregation_test.sh:6-21 (the db-1/db-2 fake-node
# pattern; transport between nodes is the caller's problem, here `cp`).
set -euo pipefail

cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu

SYBIL="python -m sybil_tpu"
WORK=${DEMO_DIR:-./demo-agg}
rm -rf "$WORK"
mkdir -p "$WORK/results"

echo "== building two single-node tables (db-1, db-2) =="
python scripts/fakedata/host_generator.py 10000 \
  | $SYBIL ingest -dir "$WORK/db-1" -table a
python scripts/fakedata/host_generator.py 10000 \
  | $SYBIL ingest -dir "$WORK/db-2" -table a
$SYBIL digest -dir "$WORK/db-1" -table a
$SYBIL digest -dir "$WORK/db-2" -table a

testagg() {
  local flags="$*"
  rm -f "$WORK"/results/*.json
  # node 1 serializes the query; both nodes execute it from the wire
  $SYBIL query -dir "$WORK/db-1" -table a -encode-flags $flags > "$WORK/f1.json"
  $SYBIL query -decode-flags -encode-results \
    < "$WORK/f1.json" > "$WORK/results/r1.json"
  $SYBIL query -dir "$WORK/db-2" -table a -encode-flags $flags > "$WORK/f2.json"
  $SYBIL query -decode-flags -encode-results \
    < "$WORK/f2.json" > "$WORK/results/r2.json"
  $SYBIL aggregate "$WORK/results" < "$WORK/f1.json"
}

echo "== -info =="
testagg -info | grep -i "count"

echo "== avg ping by host =="
OUT=$(testagg -int ping -group host -op avg)
echo "$OUT"
# parity: the aggregated total must equal the sum of both nodes' rows
TOTAL=$(echo "$OUT" | grep -oE '[0-9]+' | sort -n | tail -1)
if [ "$TOTAL" -lt 20000 ]; then
  echo "FAIL: aggregated count $TOTAL < 20000 ingested rows"
  exit 1
fi

echo "== hist ping by host =="
testagg -int ping -group host -op hist | head -20

echo "DEMO OK"
rm -rf "$WORK"
