#!/bin/sh
# Re-sweep the elastic window operating point on the real TPU.
# Usage: tools/sweep_window.sh [level] [windows...]
# Each point: full bench.py protocol (21 iters, 3 blocks, median).
# First run of a new (level, window) pays a fresh stream-graph compile
# (~5-10 min through the remote compile helper; cached afterwards).
level=${1:-3}
[ $# -gt 0 ] && shift
windows=${*:-"512 768 1024 1536"}
for w in $windows; do
  echo "=== level $level window $w ==="
  DILITHIUM_BENCH_LEVEL=$level DILITHIUM_BENCH_WINDOW=$w \
    timeout 2400 python bench.py 2>&1 | grep -E "block:|metric" | sed "s/^/W=$w /"
done
