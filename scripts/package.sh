#!/usr/bin/env bash
# Build the --py-files zip for spark-submit.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/crego_document_extractor_spark.zip
zip -qr dist/crego_document_extractor_spark.zip crego_document_extractor_spark \
    -x '*__pycache__*'
echo "dist/crego_document_extractor_spark.zip"
