#!/bin/bash
# Regenerate PLANS.md (physical-plan evidence at sf0.1) after adding or
# changing queries — QueriesSpec carries a tripwire that fails when the
# registry and PLANS.md diverge. Compile first (sbt compile); this runs
# against the compiled classes.
set -e
cd /root/repo
SPARK_GRAFT_SF_DIR=${1:-/root/testdata/sf0.1} /opt/spark/bin/spark-shell \
  --master "local[32]" \
  --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.extensions=graft.functions.GraftExtensions \
  --driver-memory 16g --driver-class-path target/scala-2.13/classes \
  -I scripts/gen_plans.scala
