"""One order-of-magnitude soak: kg_pipeline at sf1 scale (500k docs,
10x the driver's sf0.1 bench corpus), catalog on.

Records docs/sec plus peak memory of the single local-mode JVM
(executors+driver share it here) AND of the Python driver process —
the point is evidencing that no driver-side step scales with corpus
size (the only driver collects are per-partition counts and dim-scale
tables).

Run: PYTHONPATH=/root/repo python tools/soak_sf1.py [n_docs]
Prints one JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time


def _vm_hwm_kb(pid) -> int:
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmHWM:"):
                return int(line.split()[1])
    return -1


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rgbl-soak-sf1")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    jvm_pid = spark._jvm.java.lang.ProcessHandle.current().pid()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from redisgraph_bulk_loader_spark.materialize import GraphCatalog
    from redisgraph_bulk_loader_spark.plans import build_graph
    from redisgraph_bulk_loader_spark.sources import (
        alias_table,
        synthesize_documents,
    )

    out_root = tempfile.mkdtemp(prefix="rgbl_soak_")
    try:
        corpus = os.path.join(out_root, "corpus")
        t0 = time.time()
        synthesize_documents(
            spark, n_docs, seed=42, partitions=int(cpus) * 4
        ).write.parquet(corpus)
        synth_sec = round(time.time() - t0, 1)

        docs = spark.read.parquet(corpus)
        catalog = GraphCatalog(spark, os.path.join(out_root, "cat"))
        t0 = time.time()
        res = build_graph(spark, docs, alias_table(spark), catalog)
        n_triples = res["triples"].count()
        n_nodes = res["nodes"].count()
        n_edges = res["edges"].count()
        wall = time.time() - t0
        print(json.dumps({
            "soak": "kg_pipeline_sf1",
            "n_docs": n_docs,
            "wall_sec": round(wall, 1),
            "docs_per_sec": round(n_docs / wall, 1),
            "synth_sec": synth_sec,
            "n_triples": n_triples,
            "n_nodes": n_nodes,
            "n_edges": n_edges,
            "jvm_peak_rss_mb": _vm_hwm_kb(jvm_pid) // 1024,
            "python_driver_peak_rss_mb": _vm_hwm_kb("self") // 1024,
            "cpus": int(cpus),
        }))
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
