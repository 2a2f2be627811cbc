#!/bin/sh
# Build the --py-files artifact for spark-submit.
set -e
cd "$(dirname "$0")/.."
rm -f rgbl_spark.zip
zip -qr rgbl_spark.zip redisgraph_bulk_loader_spark -x "*.pyc" -x "*__pycache__*"
echo "wrote rgbl_spark.zip"
