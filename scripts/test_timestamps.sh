#!/bin/bash
# Port of /root/reference/scripts/test_timestamps.sh: ingest the same
# record count at tightening time spreads and list the encoded time
# column sizes — delta encoding should shrink as the spread tightens.
set -e
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}
N=${N:-100000}
rm -rf tsdb

for H in 0.25 0.5 1 3 6 12 24 48; do
  export H
  python scripts/fakedata/timestamp_generator.py $N | \
    python -m sybil_tpu ingest -dir tsdb -table test_${H}
  python -m sybil_tpu digest -dir tsdb -table test_${H}
done

find tsdb -name "int_time.sy*" | sort -g | xargs ls -lah
