#!/usr/bin/env bash
# Cluster deployment wrapper (north rule: "ships via spark-submit
# --py-files to run unchanged at N and 4N executors"):
#
#   tools/submit.sh --master spark://host:7077 \
#       --input s3://bucket/pages --workdir s3://bucket/run
#
# Everything after the optional --master is forwarded to the CLI
# (ollama_ocr_spark.cli: --input/--synthesize/--workdir/--mode/...).
# In-sandbox, `tools/submit.sh --input /root/testdata/sf0.001/documents.parquet
# --synthesize --workdir /tmp/subrun` runs the same job on local[*].
set -euo pipefail

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
DIST="${SPARK_EXTRACT_DIST:-/tmp/spark_extract_dist}"
mkdir -p "$DIST"

MASTER="local[*]"
if [[ "${1:-}" == "--master" ]]; then
  MASTER="$2"
  shift 2
fi

python - "$DIST/ollama_ocr_spark.zip" "$ROOT" <<'PY'
import sys
sys.path.insert(0, sys.argv[2])
from ollama_ocr_spark.session import build_dist_zip
print(build_dist_zip(sys.argv[1]))
PY

exec spark-submit \
  --master "$MASTER" \
  --py-files "$DIST/ollama_ocr_spark.zip" \
  "$ROOT/tools/submit_extract.py" "$@"
