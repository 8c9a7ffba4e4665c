#!/usr/bin/env bash
# Package the engine and launch the streaming job via spark-submit --py-files
# (the north rule's launch mode). Local default: local[8]; on a real cluster
# replace --master (yarn/k8s) and add --num-executors etc.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/mapping_analysis_spark.zip
rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" mapping_analysis_spark -x '*__pycache__*')
exec spark-submit \
  --master "${SPARK_MASTER:-local[8]}" \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  "$REPO/scripts/submit_streaming_job.py" "${1:-/root/testdata/sf0.001}" "${2:-/tmp/stream_run}"
