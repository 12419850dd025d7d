#!/bin/bash
# Concurrency soak: N concurrent ingesters + random digesters + periodic
# queries looping against one table, checking for deadlock/corruption —
# the analog of the reference's shell stress harnesses
# (/root/reference/scripts/stress_ingest_digest.sh, steady_ingest.sh,
# steady_digest.sh: 1000-iteration ingest/digest loops checking exit
# codes).
#
# Bounded by default (SOAK_ITERS=25, ~1-2 minutes); set SOAK_ITERS=1000
# SOAK_WORKERS=4 for an hours-scale soak.  Any non-zero exit of any
# worker, or a final row-count mismatch, fails the script.
set -u

cd "$(dirname "$0")/.."

ITERS=${SOAK_ITERS:-25}
WORKERS=${SOAK_WORKERS:-2}
ROWS_PER_ITER=${SOAK_ROWS:-10}
DB=${SOAK_DB:-./soak-db}
TABLE=testingest
export JAX_PLATFORMS=cpu

rm -rf "$DB"
mkdir -p "$DB"
echo "soak: $WORKERS ingesters x $ITERS iters x $ROWS_PER_ITER rows" \
     "+ random digests + queries -> $DB"

ingest_loop() {
  local wid=$1 total=0
  for iter in $(seq "$ITERS"); do
    python scripts/fakedata/host_generator.py "$ROWS_PER_ITER" \
      | python -m sybil_tpu ingest -dir "$DB" -table $TABLE \
          >> "$DB/ingest.$wid.log" 2>&1
    if [ $? -ne 0 ]; then
      echo "INGESTION FAILED (worker $wid iter $iter)"
      return 1
    fi
    total=$((total + ROWS_PER_ITER))
    if (( RANDOM % 10 == 0 )); then
      python -m sybil_tpu digest -dir "$DB" -table $TABLE \
        >> "$DB/digest.$wid.log" 2>&1
      if [ $? -ne 0 ]; then
        echo "DIGESTION FAILED (worker $wid iter $iter)"
        return 1
      fi
    fi
    if (( RANDOM % 20 == 0 )); then
      python -m sybil_tpu query -dir "$DB" -table $TABLE -read-log \
        >> "$DB/query.$wid.log" 2>&1
      if [ $? -ne 0 ]; then
        echo "QUERY FAILED (worker $wid iter $iter)"
        return 1
      fi
    fi
  done
  echo "worker $wid done ($total rows)"
}

pids=()
for w in $(seq "$WORKERS"); do
  ingest_loop "$w" &
  pids+=($!)
done

fail=0
for p in "${pids[@]}"; do
  wait "$p" || fail=1
done
if [ $fail -ne 0 ]; then
  echo "SOAK FAILED: a worker loop errored (see $DB/*.log)"
  exit 1
fi

# final digest + full-count consistency check (rowstore + blocks)
python -m sybil_tpu digest -dir "$DB" -table $TABLE || exit 1
EXPECT=$((WORKERS * ITERS * ROWS_PER_ITER))
GOT=$(python -m sybil_tpu query -dir "$DB" -table $TABLE -read-log -json \
      | python -c "import json,sys; r=json.load(sys.stdin); \
print(sum(x['Count'] for x in r))")
echo "soak: expected $EXPECT rows, counted $GOT"
if [ "$GOT" -ne "$EXPECT" ]; then
  echo "SOAK FAILED: row count mismatch"
  exit 1
fi
echo "SOAK OK"
rm -rf "$DB"
