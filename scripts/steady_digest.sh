#!/bin/bash
# One-sided steady-state soak: a single digest loop draining a
# pre-filled row store while a LIVE querier runs against the same
# table — the analog of the reference's steady_digest.sh
# (/root/reference/scripts/steady_digest.sh: a repeated-digest loop
# checking exit codes).  Verifies repeated digestion (including no-op
# digests once the store drains) never wedges or loses rows under
# concurrent queries.
#
# Bounded by default (SOAK_ITERS=25); set SOAK_ITERS=1000 for an
# hours-scale soak.  Any non-zero exit fails the script.
set -u

cd "$(dirname "$0")/.."

ITERS=${SOAK_ITERS:-25}
ROWS=${SOAK_ROWS:-2000}
DB=${SOAK_DB:-./steady-digest-db}
TABLE=testdigest
export JAX_PLATFORMS=cpu

rm -rf "$DB"
mkdir -p "$DB"
echo "steady digest: $ROWS rows, $ITERS digest iters + live querier -> $DB"

python scripts/fakedata/host_generator.py "$ROWS" \
  | python -m sybil_tpu ingest -dir "$DB" -table $TABLE \
      >> "$DB/ingest.log" 2>&1 || { echo "SEED INGEST FAILED"; exit 1; }

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
  python -m sybil_tpu digest -dir "$DB" -table $TABLE \
    >> "$DB/digest.log" 2>&1
  if [ $? -ne 0 ]; then
    echo "DIGESTION FAILED (iter $iter)"
    fail=1
    break
  fi
done

touch "$DB/.stop"
wait "$QPID" 2>/dev/null
[ $fail -ne 0 ] && exit 1

GOT=$(python -m sybil_tpu query -dir "$DB" -table $TABLE -read-log -json \
      | python -c "import json,sys; r=json.load(sys.stdin); \
print(sum(x['Count'] for x in r))")
echo "steady digest: expected $ROWS rows, counted $GOT"
if [ "$GOT" -ne "$ROWS" ]; then
  echo "STEADY DIGEST FAILED: row count mismatch"
  exit 1
fi
echo "STEADY DIGEST OK"
rm -rf "$DB"
