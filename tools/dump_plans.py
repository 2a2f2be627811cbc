"""Dump formatted physical plans of the scale-critical operators to
PLANS.md — the explain() evidence behind the plan-shape tests in
tests/test_plans.py. Regenerate: PYTHONPATH=/root/repo python
tools/dump_plans.py"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from redisgraph_bulk_loader_spark.link import build_alias_dim, link_mentions
    from redisgraph_bulk_loader_spark.operators.dedup import (
        dedup_assignments,
        dedup_lines,
        minhash_lsh_dedup_pairs,
    )
    from redisgraph_bulk_loader_spark.operators.endpoints import (
        resolve_endpoints,
    )
    from redisgraph_bulk_loader_spark.functions.text import (
        pii_count,
        redact_pii,
    )
    from redisgraph_bulk_loader_spark.operators.curation import (
        repetition_stats,
    )
    from redisgraph_bulk_loader_spark.operators.mixing import (
        decontaminate,
        hash_sample,
        pack_sequences,
        proportional_sample,
        stratified_quota_sample,
    )
    from redisgraph_bulk_loader_spark.extract import extract_mentions
    from redisgraph_bulk_loader_spark.sources import (
        alias_table,
        synthesize_documents,
    )

    docs = synthesize_documents(spark, 200, seed=42)
    mentions = extract_mentions(docs)
    linked = link_mentions(mentions, dim=build_alias_dim(alias_table(spark)))

    reg = spark.createDataFrame(
        [(str(i), i) for i in range(50)], "ext_id string, internal_id long"
    )
    edges = spark.createDataFrame([("1", "2")], "src_id string, dst_id string")
    docs_t = spark.read.parquet(os.path.join(SF, "documents.parquet"))

    sections = [
        ("Extraction + broadcast alias linking (Arrow batch -> "
         "BroadcastHashJoin; the only Python on the data path)",
         linked),
        ("Endpoint resolution, broadcast strategy (small registry)",
         resolve_endpoints(edges, reg, skip_invalid=True,
                           broadcast_registry=None, registry_rows=50)),
        ("Endpoint resolution, salted shuffle strategy (registry above "
         "the broadcast gate — note `_salt` and no broadcast)",
         resolve_endpoints(edges, reg, skip_invalid=True,
                           broadcast_registry=None,
                           registry_rows=10_000_000)),
        ("MinHash-LSH near-dup pairs (banded equi-join; no cartesian "
         "product anywhere)",
         minhash_lsh_dedup_pairs(docs_t, "doc_id", "text", threshold=0.5)),
        ("Dedup cluster assignment (portable minhash pairs -> CC over "
         "collision-free injective longs -> size-gated representative "
         "join; broadcast here because members are under the gate)",
         dedup_assignments(docs_t, "doc_id", "text", threshold=0.5,
                           portable=True)),
        ("Alias linking with the vocabulary broadcast gate OFF (the "
         "shuffle-join fallback that replaces the resolved-vocab "
         "broadcast above BROADCAST_THRESHOLD_ROWS)",
         link_mentions(mentions, dim=build_alias_dim(alias_table(spark)),
                       broadcast_vocab=False)),
        ("hash_sample: deterministic Bernoulli draw — pure scan filter, "
         "ZERO Exchange anywhere",
         hash_sample(docs_t, "doc_id", 0.25)),
        ("stratified_quota_sample: two-phase salted exact top-k — two "
         "Window nodes over the narrow (stratum, id, ord) projection; "
         "text rejoins via the winner semi-join, never rides a window "
         "shuffle",
         stratified_quota_sample(docs_t, "source", "doc_id", 10)),
        ("decontaminate: codegen regex n-gram explode; benchmark gram "
         "hashes broadcast; only (doc_id, md5) shuffles",
         decontaminate(docs_t.filter("doc_id % 37 != 0"),
                       docs_t.filter("doc_id % 37 = 0"),
                       "doc_id", "text", n=5)),
        ("pack_sequences: exact global prefix sum decomposed by hash "
         "prefix — ONE data-scale Exchange (hashpartitioning on the "
         "bucket), offsets dim aggregates to 16^k rows then "
         "BroadcastExchange; no unpartitioned data-scale Window",
         pack_sequences(docs_t, "doc_id", "n_chars", 2048)),
        ("repetition_stats (default impl='local'): per-doc stats are "
         "row-local, so the whole operator is ONE scan projection — "
         "array_sort + aggregate folds, ZERO Exchange, zero join "
         "(measured 2.7x warm / 15x cold vs the exploded twin at 1M "
         "docs)",
         repetition_stats(docs_t, "doc_id", "text", ngram_ns=(1, 5))),
        ("repetition_stats impl='exploded' (cross-checked twin / "
         "giant-single-doc fallback): explode projects to (id, md5, "
         "len) before any Exchange — text never rides the shuffle; "
         "two skew-free HashAggregates per family",
         repetition_stats(docs_t, "doc_id", "text", ngram_ns=(1, 5),
                          impl="exploded")),
        ("redact_pii + pii_count: pure codegen regexp chain, ZERO "
         "Exchange, rides the scan",
         docs_t.select("doc_id",
                       pii_count(F.col("text"), "email").alias("n"),
                       redact_pii(F.col("text")).alias("r"))),
        ("proportional_sample: per-source fractions via a broadcast "
         "recipe dim — BroadcastHashJoin + codegen threshold filter, "
         "ZERO corpus Exchange",
         proportional_sample(docs_t, "source", "doc_id",
                             {"src0": 1.0, "src1": 0.25},
                             default_fraction=0.5)),
        ("dedup_lines global: (md5(line), id, pos) is all that rides "
         "the dup-decision shuffle; groupBy-min (no window) resolves "
         "winners; only sparse removed positions join back and the "
         "document rebuild is a row-local HOF filter",
         dedup_lines(docs_t)),
    ]
    out = io.StringIO()
    out.write(
        "# PLANS — formatted physical plans of the scale-critical "
        "operators\n\nGenerated by tools/dump_plans.py at sf0.001; the "
        "shapes asserted in\ntests/test_plans.py. Re-generate after "
        "changing any operator.\n")
    for title, df in sections:
        out.write(f"\n## {title}\n\n```\n")
        out.write(formatted(df))
        out.write("```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write(out.getvalue())
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
