"""Dedup/ANN family soak beyond sf0.1 (VERDICT r4 #7): the kg pipeline
has 5M-doc soak evidence; this runs the OTHER two guarded scale paths
at one-to-three orders above the bench corpus:

- ``dedup_assignments`` (minhash, default xxhash64 family, exact-dup
  pre-collapse on) over ``n_docs`` synthesized documents — exercises
  shingle explode -> signature agg -> banded self-join -> CC -> fan-out
  at fact scale;
- ``ann_self_join_pairs`` over ``n_vecs`` synthesized 64-d embeddings
  with planted near-duplicate groups — exercises the hyperplane
  signature UDF + banded self-join + exact-cosine verify;
- ``embedding_dedup_assignments`` over the same vectors — the full
  vector-dedup composition (pairs -> connected components -> rep
  fan-out), checked against the planted group structure (each 5-group
  must collapse to its min id).

Pass ``n_docs=0`` to skip the text-dedup section and soak only the
vector family.

Embeddings are pure JVM column expressions (hash-derived, deterministic
— no RNG, no Python on the synthesis path): ids in the same group of
``group_size`` share a base vector plus a 1% per-id perturbation, so
every intra-group pair is a planted near-dup the self-join must find.

Records walls, rows, and peak RSS of the single local JVM and the
python driver — the evidence wanted is that neither driver structure
nor the banded joins blow up with corpus size.

Run: PYTHONPATH=/root/repo python tools/soak_dedup_ann.py \
        [n_docs] [n_vecs]       (defaults 5_000_000 / 500_000)
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rgbl-soak-dedup-ann")
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
    from redisgraph_bulk_loader_spark.cache import release_pins
    from redisgraph_bulk_loader_spark.operators.dedup import (
        dedup_assignments,
        embedding_dedup_assignments,
    )
    from redisgraph_bulk_loader_spark.operators.similarity import (
        ann_self_join_pairs,
    )

    out = {"soak": "dedup_ann", "n_docs": n_docs, "n_vecs": n_vecs,
           "cpus": int(cpus)}
    out_root = tempfile.mkdtemp(prefix="rgbl_soak_da_")
    try:
        # --- dedup over n_docs ------------------------------------------
        # JVM-only text synthesis (no Python on the synthesis path):
        # ~30 hash-picked vocab words per doc. Planted structure per
        # 20-doc block: ids 0/1 are EXACT duplicates (same base), ids
        # 2/3 share a base but append distinct tails (near-dups above
        # the 0.5 threshold), the rest are unique. Plus one 1000-copy
        # boilerplate group (ids < 1000 all map to base -1) exercising
        # the exact-collapse path at the scale it exists for.
        # 30 "wNNN" vocab words as flat codegen'd hash columns — a
        # transform()/element_at HOF form is interpreted row-at-a-time
        # and measured ~10x slower.
        if n_docs > 0:
            mod = F.col("id") % 20
            base = (
                F.when(F.col("id") < 1000, F.lit(-1))
                .when(mod <= 3, F.col("id") - (F.col("id") % 2))
                .otherwise(F.col("id"))
            )
            words = [
                F.concat(F.lit("w"),
                         F.pmod(F.xxhash64(base, F.lit(j)),
                                F.lit(1000)).cast("string"))
                for j in range(30)
            ]
            tail = F.when(
                (F.col("id") >= 1000) & ((mod == 2) | (mod == 3)),
                F.concat(F.lit(" uniq"), F.col("id").cast("string")),
            ).otherwise(F.lit(""))
            text = F.concat(F.concat_ws(" ", *words), tail)
            corpus = os.path.join(out_root, "corpus")
            t0 = time.time()
            (spark.range(0, n_docs, numPartitions=int(cpus) * 4)
             .select(F.col("id").cast("string").alias("doc_id"),
                     text.alias("text"))
             .write.parquet(corpus))
            out["synth_docs_sec"] = round(time.time() - t0, 1)
            docs = spark.read.parquet(corpus)
            t0 = time.time()
            assignments = dedup_assignments(docs, "doc_id", "text",
                                            threshold=0.5, method="minhash")
            n_deduped = assignments.filter(
                F.col("doc_id") != F.col("rep_id")).count()
            wall = time.time() - t0
            release_pins()
            out["dedup_wall_sec"] = round(wall, 1)
            out["dedup_docs_per_sec"] = round(n_docs / wall, 1)
            out["dedup_merged_rows"] = n_deduped

        # --- ANN self-join over n_vecs ----------------------------------
        # groups of 5: shared hash-derived base + 1% per-id jitter
        dim, group = 64, 5
        gid = (F.col("vec_id") / group).cast("long")
        emb = F.array(*[
            (
                (F.pmod(F.xxhash64(gid, F.lit(j)), F.lit(2000)) / 1000.0
                 - 1.0)
                + (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j), F.lit(7)),
                          F.lit(200)) / 200.0 - 0.5) * 0.02
            ).cast("double")
            for j in range(dim)
        ])
        vecs_path = os.path.join(out_root, "vecs")
        t0 = time.time()
        (spark.range(0, n_vecs, numPartitions=int(cpus) * 2)
         .select(F.col("id").alias("vec_id"), emb.alias("embedding"))
         .write.parquet(vecs_path))
        out["synth_vecs_sec"] = round(time.time() - t0, 1)
        vecs = spark.read.parquet(vecs_path)
        t0 = time.time()
        # 64-bit signatures (16-bit band buckets): at n >= ~100k the
        # 32/4 default's 256-bucket space makes candidates ~n^2/256 —
        # see the bucket-sizing note on ann_self_join_pairs.
        pairs = ann_self_join_pairs(vecs, threshold=0.98, dim=dim,
                                    bits=64, bands=4)
        n_pairs = pairs.count()
        # recall proxy on the planted structure: intra-group pairs
        n_intra = pairs.filter(
            (F.col("id_a") / group).cast("long")
            == (F.col("id_b") / group).cast("long")).count()
        wall = time.time() - t0
        release_pins()
        out["ann_wall_sec"] = round(wall, 1)
        out["ann_vecs_per_sec"] = round(n_vecs / wall, 1)
        out["ann_pairs"] = n_pairs
        out["ann_intra_group_pairs"] = n_intra
        out["ann_planted_pairs"] = (n_vecs // group) * (group * (group - 1) // 2)

        # --- embedding-dedup composition over the same vectors ----------
        # pairs -> connected components -> rep fan-out. Planted
        # expectation: every 5-group collapses to its min id, so
        # merged == n_vecs * (group-1)/group minus banding misses.
        t0 = time.time()
        emb_assign = embedding_dedup_assignments(
            vecs, threshold=0.98, bits=64, bands=4, dim=dim)
        n_merged = emb_assign.filter(
            F.col("vec_id") != F.col("rep_id")).count()
        wall = time.time() - t0
        release_pins()
        out["emb_dedup_wall_sec"] = round(wall, 1)
        out["emb_dedup_vecs_per_sec"] = round(n_vecs / wall, 1)
        out["emb_dedup_merged_rows"] = n_merged
        out["emb_dedup_expected_rows"] = n_vecs - (n_vecs + group - 1) // group

        out["jvm_peak_rss_mb"] = _vm_hwm_kb(jvm_pid) // 1024
        out["python_driver_peak_rss_mb"] = _vm_hwm_kb("self") // 1024
        print(json.dumps(out))
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
