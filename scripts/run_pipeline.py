"""spark-submit entry point for the KG-construction pipeline.

Usage (cluster):
    spark-submit --py-files rgbl_spark.zip scripts/run_pipeline.py \
        --input /path/to/documents_parquet --output /path/to/catalog \
        [--aliases /path/to/alias_parquet] [--strict-spans]

Usage (sandbox smoke):
    PYTHONPATH=. python scripts/run_pipeline.py --synthesize 10000 \
        --output /tmp/kg_out

The --py-files zip is produced by scripts/make_pyfiles.sh (just zips
the redisgraph_bulk_loader_spark package).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="documents parquet/Iceberg path")
    ap.add_argument("--synthesize", type=int, default=0,
                    help="synthesize N docs instead of reading --input")
    ap.add_argument("--aliases", help="alias dictionary parquet "
                                      "(surface, canonical_id)")
    ap.add_argument("--output", required=True, help="catalog root")
    ap.add_argument("--strict-spans", action="store_true")
    ap.add_argument("--lsh-threshold", type=float, default=0.5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("kg-construct").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from redisgraph_bulk_loader_spark.materialize import GraphCatalog
    from redisgraph_bulk_loader_spark.plans import build_graph
    from redisgraph_bulk_loader_spark.sources import (
        alias_table,
        synthesize_documents,
    )

    if args.synthesize:
        docs = synthesize_documents(spark, args.synthesize, seed=42)
    elif args.input:
        docs = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthesize is required")

    aliases = (
        spark.read.parquet(args.aliases) if args.aliases else alias_table(spark)
    )

    catalog = GraphCatalog(spark, args.output)
    t0 = time.time()
    res = build_graph(
        spark, docs, aliases, catalog,
        lsh_threshold=args.lsh_threshold, strict_spans=args.strict_spans,
    )
    stats = {
        "wall_sec": round(time.time() - t0, 2),
        "nodes": res["nodes"].count(),
        "edges": res["edges"].count(),
        "triples": res["triples"].count(),
        "lineage": catalog.lineage(),
    }
    print(json.dumps(stats, indent=1))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
