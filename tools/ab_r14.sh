#!/bin/bash
# Interleaved A/B for round 14: alternate profile runs between two trees
# (A = pristine snapshot, B = working tree) so the half-hour-scale host
# tax hits both sides equally (the r13 method). Each side runs the same
# query list through tools/profile_r13.py (noop sink, 3-rep medians).
#
# Usage: tools/ab_r14.sh <tree_a> <tree_b> <rounds> <out_prefix> <query...>
set -u
TREE_A=$1; TREE_B=$2; ROUNDS=$3; OUT=$4; shift 4
for i in $(seq 1 "$ROUNDS"); do
  for side in A B; do
    tree=$([ "$side" = A ] && echo "$TREE_A" || echo "$TREE_B")
    (cd "$tree" && python tools/profile_r13.py --reps 3 \
        --json "${OUT}_${side}${i}.json" "$@") \
        > "${OUT}_${side}${i}.log" 2>&1
    echo "round $i side $side done: $(tail -1 "${OUT}_${side}${i}.log")"
  done
done
