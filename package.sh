#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit deployment.
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/ceef_spark.zip
zip -qr dist/ceef_spark.zip cardinality_estimation_evaluation_framework_spark \
    -x '*__pycache__*'
echo "wrote dist/ceef_spark.zip ($(du -h dist/ceef_spark.zip | cut -f1))"
