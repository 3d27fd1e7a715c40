#!/usr/bin/env bash
# Extract the per-eval val-PCK series (and final line) from a running.log.
# Usage: scripts/soak/extract_curve.sh <running.log>
LOG=${1:?usage: extract_curve.sh <running.log>}
echo "# $LOG"
grep "overall PCK" "$LOG" | sed 's/.*overall PCK \([0-9.]*\).*/\1/' | tr '\n' ' '
echo
grep -E "saving checkpoint|saved final state" "$LOG" | tail -2
