#!/bin/bash
# Alternating A/B bench: r10 HEAD (repo root) vs r9 HEAD (.ab_r9 worktree).
set -u
OUT=/root/repo/.ab_out
mkdir -p "$OUT"
for pass in 1 2; do
  for side in r10 r9; do
    if [ "$side" = r10 ]; then DIR=/root/repo; else DIR=/root/repo/.ab_r9; fi
    echo "=== pass $pass side $side $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg) ==="
    (cd "$DIR" && python bench.py 2>"$OUT/${side}_p${pass}.err" | tail -1 > "$OUT/${side}_p${pass}.json")
    tail -c 300 "$OUT/${side}_p${pass}.json"; echo
  done
done
echo AB_DONE
