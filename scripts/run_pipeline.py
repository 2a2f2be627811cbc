"""spark-submit entry point for the KG-construction pipeline.

Usage (cluster):
    spark-submit --py-files rgbl_spark.zip scripts/run_pipeline.py \
        --input /path/to/documents_parquet --output /path/to/catalog \
        [--aliases /path/to/alias_parquet] [--strict-spans]

Usage (sandbox smoke):
    PYTHONPATH=. python scripts/run_pipeline.py --synthesize 10000 \
        --output /tmp/kg_out

Thin wrapper over redisgraph_bulk_loader_spark.cli:pipeline_main (the
installed `rgbl-spark-pipeline` console script). The --py-files zip is
produced by scripts/make_pyfiles.sh.
"""

from __future__ import annotations

import sys

from redisgraph_bulk_loader_spark.cli import pipeline_main

if __name__ == "__main__":
    sys.exit(pipeline_main())
