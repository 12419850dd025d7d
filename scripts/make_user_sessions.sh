#!/bin/bash
# Build the user_sessions benchmark table (the reference's
# scripts/make_user_sessions.sh: activity_generator | sybil ingest).
# Usage: scripts/make_user_sessions.sh [N_ROWS] [DB_DIR]
set -e
N=${1:-1000000}
DIR=${2:-./db}
cd "$(dirname "$0")/.."
python scripts/fakedata/activity_generator.py "$N" --bulk -dir "$DIR" -table user_sessions
