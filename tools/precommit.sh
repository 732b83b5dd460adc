#!/usr/bin/env bash
# Pre-commit / end-of-round gate: the tree being committed must COMPILE
# (main + tests) and pass the sf0.001 Verify smoke. Round 12 ended on a
# snapshot that had never been compiled — one bad expression emptied the
# round's entire correctness record; this script makes that failure mode
# a deliberate act instead of an accident.
#
# Usage: tools/precommit.sh          # compile + smoke (~2 min)
#        tools/precommit.sh --fast   # compile only (~30 s)
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch compile Test/compile

if [[ "${1:-}" != "--fast" ]]; then
  out=$(mktemp -d /tmp/graft-precommit.XXXXXX)
  log=$(mktemp /tmp/graft-precommit-log.XXXXXX)
  # capture sbt's own exit status: a Verify that CRASHES mid-run prints
  # no "[verify] ... failed" line, and a pipeline grep would swallow
  # the non-zero status while the partial result dirs pass the >0 check
  if ! sbt -batch "runMain graft.Verify /root/testdata/sf0.001 $out" \
      > "$log" 2>&1; then
    tail -30 "$log"
    echo "precommit: verify smoke CRASHED (sbt exit != 0, log above)"
    exit 1
  fi
  if grep -E "\[verify\].*failed" "$log"; then
    echo "precommit: verify smoke FAILED (see above)"; exit 1
  fi
  n=$(find "$out" -mindepth 1 -maxdepth 1 -type d | wc -l)
  [[ "$n" -gt 0 ]] || { echo "precommit: verify wrote no results"; exit 1; }
  echo "precommit: OK (compile green, $n query results at sf0.001)"
else
  echo "precommit: OK (compile green; smoke skipped)"
fi
