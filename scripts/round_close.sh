#!/usr/bin/env bash
# Promote driver-written round artifacts into the tree (r12, VERDICT r11
# "What's wrong" #4): the driver's post-round run writes/overwrites
# BENCH_r<N>.json, CORRECTNESS_r<N>.json and bumps LEAKCHECK.json, and
# historically left them untracked/modified in the working tree. Run this
# at the START of a round (or any time) to commit that residue with a
# pathspec-scoped commit; a clean tree is a no-op.
set -euo pipefail
cd "$(dirname "$0")/.."

STAGED=()
for f in BENCH_r*.json CORRECTNESS_r*.json LEAKCHECK.json COPYCHECK.json \
         BENCH_CANARY.json VERDICT.md ADVICE.md; do
  [ -e "$f" ] || continue
  # gitignored artifacts (e.g. COPYCHECK.json) stay out of the tree
  if git check-ignore -q "$f"; then continue; fi
  # untracked, or tracked-with-modifications
  if ! git ls-files --error-unmatch "$f" > /dev/null 2>&1 \
     || ! git diff --quiet -- "$f"; then
    git add -- "$f"
    STAGED+=("$f")
  fi
done

if [ "${#STAGED[@]}" -eq 0 ]; then
  echo "round_close: no driver artifacts to promote (tree clean)"
else
  git commit -m "promote driver round artifacts: ${STAGED[*]}" -- "${STAGED[@]}"
  echo "round_close: committed ${STAGED[*]}"
fi
