#!/bin/bash
# One-sided steady-state soak: a single ingest loop running against a
# LIVE querier (background query loop on the same table), no digests —
# the analog of the reference's steady_ingest.sh
# (/root/reference/scripts/steady_ingest.sh: a 1000-iteration ingest
# loop checking exit codes).  Verifies a steady ingest stream never
# wedges or corrupts a table that is being queried concurrently.
#
# Bounded by default (SOAK_ITERS=50, ~1 minute); set SOAK_ITERS=1000
# for an hours-scale soak.  Any non-zero exit fails the script.
set -u

cd "$(dirname "$0")/.."

ITERS=${SOAK_ITERS:-50}
ROWS_PER_ITER=${SOAK_ROWS:-10}
DB=${SOAK_DB:-./steady-ingest-db}
TABLE=testingest
export JAX_PLATFORMS=cpu

rm -rf "$DB"
mkdir -p "$DB"
echo "steady ingest: $ITERS iters x $ROWS_PER_ITER rows + live querier -> $DB"

# live querier: loops -read-log queries until told to stop
query_loop() {
  while [ ! -f "$DB/.stop" ]; do
    python -m sybil_tpu query -dir "$DB" -table $TABLE -read-log \
      >> "$DB/query.log" 2>&1 || true
    sleep 0.2
  done
}
query_loop &
QPID=$!

fail=0
for iter in $(seq "$ITERS"); do
  python scripts/fakedata/host_generator.py "$ROWS_PER_ITER" \
    | python -m sybil_tpu ingest -dir "$DB" -table $TABLE \
        >> "$DB/ingest.log" 2>&1
  if [ $? -ne 0 ]; then
    echo "INGESTION FAILED (iter $iter)"
    fail=1
    break
  fi
done

touch "$DB/.stop"
wait "$QPID" 2>/dev/null
[ $fail -ne 0 ] && exit 1

EXPECT=$((ITERS * ROWS_PER_ITER))
GOT=$(python -m sybil_tpu query -dir "$DB" -table $TABLE -read-log -json \
      | python -c "import json,sys; r=json.load(sys.stdin); \
print(sum(x['Count'] for x in r))")
echo "steady ingest: expected $EXPECT rows, counted $GOT"
if [ "$GOT" -ne "$EXPECT" ]; then
  echo "STEADY INGEST FAILED: row count mismatch"
  exit 1
fi
echo "STEADY INGEST OK"
rm -rf "$DB"
