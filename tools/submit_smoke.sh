#!/usr/bin/env bash
# spark-submit smoke for the PRODUCTION entry point (graft.Main): proves the
# end-to-end pipeline runs under a spark-submit-built session AND that the
# Catalyst extension (fused kernels) resolves there — closing the gap between
# "tested session config" (ScalaTest builds its own session) and the real
# submit path. Run from the repo root:
#   bash tools/submit_smoke.sh
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="$(mktemp -d /tmp/graft-submit-XXXX)"
trap 'rm -rf "$WORK"' EXIT

sbt -batch package > "$WORK/package.log" 2>&1 || { tail -20 "$WORK/package.log"; exit 1; }
JAR="$(ls target/scala-2.13/logadempiricalspark_2.13-*.jar | head -1)"

OUT="$("/opt/spark/bin/spark-submit" \
  --class graft.Main \
  --master 'local[4]' \
  --conf spark.sql.shuffle.partitions=4 \
  --conf spark.ui.enabled=false \
  "$JAR" "$WORK/run" 2>"$WORK/submit.log" | tail -1)" || {
    tail -30 "$WORK/submit.log"; exit 1; }

echo "submit output: $OUT"
case "$OUT" in
  *'"fused":true'*) echo "OK: fused kernels resolved under spark-submit" ;;
  *) echo "FAIL: extension did not resolve under spark-submit"; exit 1 ;;
esac
TURNS=$(printf '%s' "$OUT" | sed -n 's/.*"turns":\([0-9]*\).*/\1/p')
[ -n "$TURNS" ] && [ "$TURNS" -gt 0 ] || { echo "FAIL: no turns processed"; exit 1; }
echo "OK: $TURNS turns through the submit path"
