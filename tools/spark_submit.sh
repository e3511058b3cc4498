#!/usr/bin/env bash
# spark-submit wrapper for the graft CLI (graft.Main). Builds the jar if
# needed. Usage examples:
#   tools/spark_submit.sh gen --out /tmp/wal --events 1000000 --segments 8
#   tools/spark_submit.sh ingest --wal /tmp/wal --table /tmp/pages --checkpoint /tmp/ckpt
#   tools/spark_submit.sh state --table /tmp/pages
set -euo pipefail
cd "$(dirname "$0")/.."
JAR=$(ls target/scala-2.13/etlspark_2.13-*.jar 2>/dev/null | head -1 || true)
if [[ -z "$JAR" ]]; then
  sbt -batch --error package
  JAR=$(ls target/scala-2.13/etlspark_2.13-*.jar | head -1)
fi
exec /opt/spark/bin/spark-submit \
  --master "${SPARK_MASTER:-local[$(( $(nproc) < 32 ? $(nproc) : 32 ))]}" \
  --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --conf spark.ui.enabled=false \
  --class graft.Main "$JAR" "$@"
