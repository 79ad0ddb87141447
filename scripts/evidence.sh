#!/usr/bin/env bash
# One-command on-chip evidence refresh (`make evidence`).
#
# Runs the standing truth checks serially on the real TPU and drops DATED
# logs into docs/ab_logs/, so end-of-round witnessing is one command and
# evidence can never again be "not retained" (VERDICT r4 #8; the r3 loss of
# /tmp session logs is the incident this prevents).
#
# Rules honored (CLAUDE.md): ONE TPU process at a time; legs run to clean
# exit (never killed); a cool-down separates legs because a fresh client
# right after an exit can hang on the axon lease.
#
# Usage:
#   bash scripts/evidence.sh                # or: make evidence
#   GIC_EVIDENCE_LEGS="tpu_validation" bash scripts/evidence.sh   # subset
#
# Run the whole script detached if the shell may go away:
#   setsid nohup bash scripts/evidence.sh > /tmp/evidence.log 2>&1 & disown

set -u
cd "$(dirname "$0")/.."

STAMP=$(date +%Y%m%d)
COOL=${GIC_EVIDENCE_COOLDOWN_S:-150}
LEGS=${GIC_EVIDENCE_LEGS:-"tpu_validation kernel_sample_ab"}
first=1

run_leg() {
  local name=$1; shift
  local log="docs/ab_logs/${name}_${STAMP}.log"
  if [ "$first" = 0 ]; then
    echo "[evidence] cooling ${COOL}s (axon lease settle)"
    sleep "$COOL"
  fi
  first=0
  echo "[evidence] $name -> $log"
  "$@" > "$log" 2>&1
  local rc=$?
  echo "[evidence] $name rc=$rc"
  tail -3 "$log" | sed 's/^/[evidence]   /'
}

for leg in $LEGS; do
  case "$leg" in
    tpu_validation)   run_leg tpu_validation python -u scripts/tpu_validation.py ;;
    kernel_sample_ab) run_leg kernel_sample_ab python -u scripts/kernel_sample_ab.py ;;
    *) echo "[evidence] unknown leg '$leg' (known: tpu_validation kernel_sample_ab)" ;;
  esac
done
echo "[evidence] done — commit the new docs/ab_logs/*_${STAMP}.log files"
