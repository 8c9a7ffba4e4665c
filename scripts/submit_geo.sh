#!/usr/bin/env bash
# Package the engine and launch the settlement streaming job via
# spark-submit --py-files at a chosen cluster size (north-rule launch mode).
#   SPARK_MASTER=local-cluster[2,1,3072] scripts/submit_geo.sh /tmp/geo_N
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/mapping_analysis_spark.zip
rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" mapping_analysis_spark -x '*__pycache__*')
exec spark-submit \
  --master "${SPARK_MASTER:-local[8]}" \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  "$REPO/scripts/submit_geo_job.py" "${1:-/tmp/geo_stream_run}"
