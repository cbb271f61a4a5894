#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/pipelinewise_spark.zip
zip -qr dist/pipelinewise_spark.zip pipelinewise_spark -x '*__pycache__*'
echo "dist/pipelinewise_spark.zip"
