#!/usr/bin/env bash
# Packaged-artifact check (round-11 ask #6): build the versioned jar with
# `sbt package`, then compile and run a USAGE.md example against THAT JAR
# ONLY — target/classes is deliberately absent from both classpaths, so a
# public API that exists in the source tree but not in the published
# artifact (wrong package dir, resource not bundled, version drift) fails
# here even while `sbt test` stays green.
#
# Usage: tools/package_check.sh [sfDir]   (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.001}"
SPARK_JARS="/opt/spark/jars"

sbt -batch package
JAR="$(ls target/scala-2.13/mahoutsamsarabookspark_2.13-*.jar | head -1)"
echo "[package_check] artifact: $JAR"

WORK="$(mktemp -d /tmp/graft-package-check.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

# the Spark distribution ships the matching scala compiler; compile the
# example with ONLY jar + spark on the classpath
java -cp "$SPARK_JARS/*" scala.tools.nsc.Main \
  -classpath "$JAR:$SPARK_JARS/*" \
  -d "$WORK" tools/PackagedUsage.scala
echo "[package_check] example compiled against the jar"

# JDK17 module opens — same list build.sbt forks with
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

OUT="$(java $ADD_OPENS -Xmx4g \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$WORK:$JAR:$SPARK_JARS/*" PackagedUsage "$SF" 2>&1 | tee "$WORK/run.log" \
  | grep "PACKAGED-USAGE-OK" || true)"
if [ -z "$OUT" ]; then
  echo "[package_check] FAILED — no PACKAGED-USAGE-OK marker; tail of log:"
  tail -30 "$WORK/run.log"
  exit 1
fi
echo "[package_check] $OUT"
echo "[package_check] PASS"
