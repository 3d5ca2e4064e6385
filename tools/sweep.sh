#!/usr/bin/env bash
# Standard final gate for a round (VERDICT r13 Next #7): full Verify dump +
# cached DuckDB oracle sweep at BOTH scale factors. The oracle cache
# (tools/.oracle_cache) makes the repeat sf0.1 sweep minutes, not ~50 min,
# so there is no cost excuse for skipping the blanket sweep.
#
# Usage: tools/sweep.sh [sf0.01|sf0.1|both]   (default: both)
set -euo pipefail
cd "$(dirname "$0")/.."

scale="${1:-both}"

run_scale() {
  local sf="$1" out="$2"
  echo "=== sweep $sf ==="
  rm -rf "$out"
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out" 2>&1 \
    | grep '\[verify\]' || true
  python3 tools/compare.py "/root/testdata/$sf" "$out" \
    --fast --jobs 8 --crosscheck-sample 12
}

sbt -batch compile Test/compile

case "$scale" in
  sf0.01) run_scale sf0.01 /tmp/sweep_sf001 ;;
  sf0.1)  run_scale sf0.1  /tmp/sweep_sf01 ;;
  both)   run_scale sf0.01 /tmp/sweep_sf001
          run_scale sf0.1  /tmp/sweep_sf01 ;;
  *) echo "usage: tools/sweep.sh [sf0.01|sf0.1|both]" >&2; exit 2 ;;
esac
