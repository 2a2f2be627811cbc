"""Two-cluster-size scaling evidence (north_rule).

A real N->4N executor comparison is impossible in this sandbox, so the
same job runs at two parallelism levels on identical input:
local[8] (N) and local[32] (4N), reporting docs/sec at both and the
scaling efficiency  eff = T8 / (4 * T32)  (== throughput32 /
(4 * throughput8)).

Each measurement is a fresh subprocess (own JVM) so the two runs share
nothing. The measured job is the KG-construction core (synthesize ->
span-validate -> extract -> link -> triples count): the
throughput-bound path. Results are printed as JSON and appended to
BENCH_SCALING.json.

Usage: PYTHONPATH=/root/repo python tools/scaling_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{cores}]")
         .appName(f"scale-{cores}")
         .config("spark.sql.shuffle.partitions", str(cores * 2))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo")
from redisgraph_bulk_loader_spark.sources import alias_table, synthesize_documents
from redisgraph_bulk_loader_spark.extract import extract_mentions, validate_span_sequences
from redisgraph_bulk_loader_spark.link import link_mentions

# warm-up: tiny run to JIT/py-worker-pool warm both configurations equally
docs_w = synthesize_documents(spark, 1000, seed=1, partitions=cores)
link_mentions(extract_mentions(docs_w), alias_table(spark)).count()

t0 = time.time()
docs = synthesize_documents(spark, n_docs, seed=42, partitions=cores * 3)
docs = docs.filter(validate_span_sequences(docs))
mentions = extract_mentions(docs)
linked = link_mentions(mentions, alias_table(spark))
n = linked.filter("subj_cid is not null and obj_cid is not null") \
          .select("subj_cid", "pred", "obj_cid").count()
dt = time.time() - t0
print(json.dumps({"cores": cores, "n_docs": n_docs, "triples": n,
                  "wall_sec": round(dt, 2),
                  "docs_per_sec": round(n_docs / dt, 1)}))
spark.stop()
"""


def run(cores: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(n_docs)],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "PYTHONPATH": "/root/repo"},
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    r8 = run(8, n_docs)
    r32 = run(32, n_docs)
    eff = r32["docs_per_sec"] / (4 * r8["docs_per_sec"])
    result = {
        "job": "kg_core(synthesize+validate+extract+link+count)",
        "n_docs": n_docs,
        "N(local[8])": r8,
        "4N(local[32])": r32,
        "scaling_efficiency": round(eff, 3),
        "criterion": ">=0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(result, indent=1))
    with open("/root/repo/BENCH_SCALING.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
