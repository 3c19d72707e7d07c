#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission (north_rule launch shape):
#
#   jobs/package.sh && spark-submit --py-files dist/sparkx.zip jobs/extract.py \
#       --input <iceberg/parquet path> --output <path> --groups 64
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/sparkx.zip
zip -qr dist/sparkx.zip sparkx agentic_rag_for_multi_model_pdf_extraction_spark -x '*__pycache__*'
echo "built dist/sparkx.zip:"
unzip -l dist/sparkx.zip | tail -3
