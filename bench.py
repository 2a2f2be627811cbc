"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Noise-robust protocol (VERDICT r3 #1: the sandbox is a shared microVM
with measured 2-6x same-day swings; round-3's recorded numbers were
uniformly ~2.2x round-2's across UNCHANGED plans):
- INTERLEAVED passes: every query runs once per pass, then the whole
  set repeats ($SPARK_GRAFT_BENCH_PASSES, default 3). A contended
  window inflates one pass uniformly; min-per-query over passes
  recovers machine capability unless contention spans every pass.
- The recorded value per query is the min; ALL per-pass times are in
  extras["<q>_runs"] with pass wall-clock start stamps in
  extras["pass_started_at"], so variance is visible inside the
  artifact instead of needing builder-side forensics.
- A fixed pure-JVM noise probe (sum over spark.range) is timed at the
  start of each pass (extras["noise_probe_sec"]): if probe times swing
  across passes, the host was contended — judge the mins accordingly.

Headline set:
- kg_pipeline: full KG construction (synthesize spans docs scaled to
  the sf's documents row count -> extract -> link -> canonicalize ->
  ids -> edges -> triples materialized to /tmp) — the north-star job;
  also reports docs/sec in the JSON extras.
- representative operators over the sf tables: tpch_q1 aggregation,
  the dedup family, the ANN family (incl. a 3-step-Lloyd IVF config —
  VERDICT r3 #6: same job shape per extra step), sessionization.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"rgbl-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from redisgraph_bulk_loader_spark.cache import release_pins
    from redisgraph_bulk_loader_spark.materialize import GraphCatalog
    from redisgraph_bulk_loader_spark.operators.dedup import dedup_assignments
    from redisgraph_bulk_loader_spark.operators.similarity import ivf_topk
    from redisgraph_bulk_loader_spark.plans import build_graph
    from redisgraph_bulk_loader_spark.sources import (
        alias_table,
        synthesize_documents,
    )

    timings = {}
    extras = {}

    # Warm the python worker pool across every task slot before timing:
    # workers fork + import pandas lazily per slot, and a cold pool puts
    # a parallelism-dependent fork storm inside the first measurement.
    import pandas as _pd

    def _noop(it):
        for pdf in it:
            yield _pd.DataFrame({"n": [len(pdf)]})

    spark.range(0, int(cpus) * 4000, numPartitions=int(cpus) * 2).mapInPandas(
        _noop, "n long"
    ).count()

    def noise_probe() -> float:
        t0 = time.time()
        spark.range(0, 200_000_000, numPartitions=int(cpus)).agg(
            F.sum("id")
        ).collect()
        return round(time.time() - t0, 3)

    # --- query thunks -------------------------------------------------------
    # The corpus is a stored table in production; generation is not
    # pipeline cost. Synthesize to parquet once, then time the pipeline
    # reading it (scan -> extract -> link -> canonicalize -> ids ->
    # edges -> materialize).
    n_docs = 10 * spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).count()
    out_root = tempfile.mkdtemp(prefix="rgbl_bench_")
    corpus_path = os.path.join(out_root, "corpus")
    t0 = time.time()
    synthesize_documents(
        spark, n_docs, seed=42, partitions=int(cpus) * 2
    ).write.parquet(corpus_path)
    extras["kg_synthesize_sec"] = round(time.time() - t0, 3)

    cat_counter = [0]

    def run_kg_pipeline() -> int:
        docs = spark.read.parquet(corpus_path)
        cat_counter[0] += 1
        catalog = GraphCatalog(
            spark, os.path.join(out_root, f"cat{cat_counter[0]}"))
        res = build_graph(spark, docs, alias_table(spark), catalog)
        return res["triples"].count()

    qs = entrymod.queries()
    OPERATORS = ["tpch_q1", "dedup_exact", "dedup_minhash_lsh",
                 "dedup_clusters", "ann_brute_force", "ann_lsh", "ann_ivf",
                 "ann_self_join", "emb_dedup_clusters", "events_sessionize",
                 "media_near_dup", "corpus_curation",
                 "corpus_curation_rep",
                 "mix_proportions",
                 "mix_stratified_quota", "mix_token_budget",
                 "mix_pack_sequences", "doc_repetition", "doc_pii_redact",
                 "dedup_lines_global", "boilerplate_lines", "decontaminate"]

    def op_thunk(name):
        return lambda: qs[name](spark, sf_dir).count()

    docs_tbl = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def run_dedup_clusters_minhash() -> int:
        # DEFAULT xxhash64 hash family — the non-oracle production
        # configuration (the oracled dedup_clusters entry runs the
        # portable md5 family).
        return dedup_assignments(docs_tbl, "doc_id", "text", threshold=0.5,
                                 method="minhash").count()

    emb_tbl = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).withColumn("embedding", F.col("embedding").cast("array<double>"))

    def run_ann_ivf_iter3() -> int:
        # VERDICT r3 #6: production-ish IVF fit — 3 Lloyd steps, each
        # one Arrow-matmul assignment pass + one groupBy-avg job.
        queries = emb_tbl.filter(F.col("vec_id") < 3)
        return ivf_topk(emb_tbl, queries, k=5, n_centroids=16, n_probe=4,
                        n_iters=3).count()

    thunks = {"kg_pipeline": run_kg_pipeline}
    for name in OPERATORS:
        thunks[name] = op_thunk(name)
    thunks["dedup_clusters_minhash"] = run_dedup_clusters_minhash
    thunks["ann_ivf_iter3"] = run_ann_ivf_iter3

    # --- interleaved passes -------------------------------------------------
    runs = {name: [] for name in thunks}
    rows = {}
    extras["pass_started_at"] = []
    extras["noise_probe_sec"] = []
    try:
        for _ in range(passes):
            extras["pass_started_at"].append(round(time.time(), 1))
            extras["noise_probe_sec"].append(noise_probe())
            for name, thunk in thunks.items():
                t0 = time.time()
                rows[name] = thunk()
                runs[name].append(round(time.time() - t0, 3))
                release_pins()
        # Resume evidence (north_rule: a killed job reruns only missing
        # stages): rebuilding against the LAST pass's completed catalog
        # must skip extraction + writes, paying only the resume
        # fingerprint scan + catalog reads.
        t0 = time.time()
        docs = spark.read.parquet(corpus_path)
        catalog = GraphCatalog(
            spark, os.path.join(out_root, f"cat{cat_counter[0]}"))
        res = build_graph(spark, docs, alias_table(spark), catalog)
        res["triples"].count()
        extras["kg_pipeline_resume_sec"] = round(time.time() - t0, 3)
        # per-stage write walls from the last full pass's commit log —
        # the in-artifact decomposition of where kg_pipeline time goes
        extras["kg_stage_walls"] = {
            rec["stage"]: rec["wall_sec"] for rec in catalog.lineage()
        }
        release_pins()
    finally:
        shutil.rmtree(out_root, ignore_errors=True)

    for name, ts in runs.items():
        timings[name] = min(ts)
        extras[f"{name}_runs"] = ts
    for name in OPERATORS + ["dedup_clusters_minhash", "ann_ivf_iter3"]:
        extras[f"{name}_rows"] = rows[name]
    dt = timings["kg_pipeline"]
    extras["kg_docs"] = n_docs
    extras["kg_triples"] = rows["kg_pipeline"]
    extras["kg_docs_per_sec"] = round(n_docs / dt, 1)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "extras": extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
