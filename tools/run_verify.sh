#!/bin/bash
# Run graft.Verify directly with java (faster than sbt runMain).
# Usage: tools/run_verify.sh <sfDir> <outDir> [mainClass]
set -e
SF=${1:-/root/testdata/sf0.001}
OUT=${2:-/tmp/verify_out}
MAIN=${3:-graft.Verify}
BENCH_OUT=${SPARK_GRAFT_BENCH_OUT:-bench_out.json}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
rc=0
java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$SF" "$OUT" || rc=$?
# Bench contract: the driver parses the FINAL stdout line as JSON — and
# keeps only the LAST 2000 stdout chars, so the re-emitted record must be
# the COMPACT line (bench_line.json); the full record (bench_out.json)
# blew that window in rounds 5-7 and shipped "parsed": null. Fall back to
# the full record only if the compact file is missing (older class).
BENCH_LINE=${SPARK_GRAFT_BENCH_LINE:-bench_line.json}
if [ "$MAIN" = "graft.Bench" ] && [ "$rc" = "0" ]; then
  if [ -f "$BENCH_LINE" ]; then
    tail -n 1 "$BENCH_LINE"
  elif [ -f "$BENCH_OUT" ]; then
    tail -n 1 "$BENCH_OUT"
  fi
fi
exit $rc
