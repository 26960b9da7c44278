#!/bin/bash
# Round-close artifact stamping (SURVEY checklist #1 — flagged by the
# judge nine consecutive rounds): stage every round artifact that
# exists so the final commit closes a CLEAN tree. Run as the last step
# before the round's closing commit:
#
#   tools/close.sh <round-number> && git commit -m "round N artifacts"
#
# Artifacts the driver writes AFTER the close (its own post-close bench
# and correctness passes) can only be staged by the NEXT session; this
# script makes everything that exists at close time tracked, so the
# only possible residue is genuinely post-close.
set -e
cd "$(dirname "$0")/.."
N="$1"
if [ -z "$N" ]; then echo "usage: tools/close.sh <round-number>"; exit 1; fi
staged=0
for f in BENCH_FULL.json BENCH_TABLE_LEDGER.json LEAKCHECK.json \
         BENCH_FULL_PARTIAL.json COPYCHECK.json \
         "BENCH_r$N.json" "CORRECTNESS_r$N.json" "BENCH_FULL_r$N.json" \
         "BENCH_ADJUDICATION_r$N.json" BENCH_SCALE*.json; do
  if [ -f "$f" ] && ! git check-ignore -q "$f"; then
    git add "$f"; staged=$((staged + 1))
  fi
done
echo "staged $staged artifact files; tree status:"
git status --short
