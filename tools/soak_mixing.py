"""Mixing-family soak beyond sf0.1 (round 5): hash_sample,
stratified_quota_sample, and decontaminate at one-to-three orders above
the bench corpus, with planted structure so correctness is asserted at
scale, not just wall time:

- ``hash_sample`` over ``n_docs`` rows at fraction 0.1 — the selected
  count must land within 5 sigma of the binomial expectation, and the
  same call must be layout-invariant (scan-only, zero shuffle).
- ``stratified_quota_sample`` over a deliberately SKEWED stratification
  (one stratum holds ~90% of rows — the exact shape where a naive
  single-window top-k funnels through one reducer): per-stratum counts
  must equal min(quota, |stratum|).
- ``token_budget_sample`` (budget 5M chars per stratum, well under
  the hot stratum's total — the regime the two-phase decomposition is
  for): per-stratum kept-weight must be within one document of the
  budget from below, never above.
- ``pack_sequences`` (window 2048) over all ``n_docs`` rows: the
  packed stream must be a perfect concatenation — min offset 0, max
  offset+weight == total weight, and every start offset distinct
  (weights >= 1 make gap-free equivalent to these three aggregates).
- ``repetition_stats`` (word unigrams) over all ``n_docs`` rows with
  planted fully-repetitive documents (id % 997 == 0 outside the
  decontamination range gets a constant 20x-repeated word): the set of
  documents whose duplicated-word char mass equals their total word
  mass must be exactly the planted set (a hash-soup doc would need all
  20 of its 1000-bucket words pairwise duplicated — probability ~0,
  and the corpus is deterministic so the check is stable).
- ``dedup_lines`` (global) over all ``n_docs`` rows with a boilerplate
  footer line appended to EVERY document (the 10M-doc footer is ONE
  groupBy-min row — the exact shape a window-based winner pick would
  funnel through one reducer): total removals must equal
  (n_docs - 1) footer copies + (n_planted - 1) duplicated all-repeat
  first lines.
- ``decontaminate`` over ``n_decontam`` docs with a planted benchmark:
  every 1000th doc's text IS a benchmark text (full n-gram overlap) and
  all other texts are unique hash-derived word soup, so the flagged
  count must be exactly n_decontam // 1000.

Texts are pure JVM column expressions (hash-derived, no RNG, no Python
on the synthesis path) — same discipline as soak_dedup_ann.py.

Run: PYTHONPATH=/root/repo python tools/soak_mixing.py \
        [n_docs] [n_decontam]      (defaults 10_000_000 / 2_000_000)
Prints one JSON line with walls, rows, and peak RSS.
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_decontam = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rgbl-soak-mixing")
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
    from redisgraph_bulk_loader_spark.operators.mixing import (
        decontaminate,
        hash_sample,
        pack_sequences,
        stratified_quota_sample,
        token_budget_sample,
    )

    out = {"soak": "mixing", "n_docs": n_docs, "n_decontam": n_decontam,
           "cpus": int(cpus)}
    out_root = tempfile.mkdtemp(prefix="rgbl_soak_mix_")
    try:
        # --- synthesize: skewed strata + unique word-soup text ----------
        # stratum 'hot' holds ids with id % 10 != 0 (~90%); the rest
        # split across s1..s9 by id % 100. Text: 20 hash-picked vocab
        # words; every 1000th doc instead repeats the text of its
        # benchmark base (id % 1000 == 0 docs ARE the benchmark set).
        stratum = (
            F.when(F.col("id") % 10 != 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("s"), (F.col("id") % 100).cast("string")))
        )
        words = [
            F.concat(F.lit("w"),
                     F.pmod(F.xxhash64(F.col("id"), F.lit(j)),
                            F.lit(1000)).cast("string"))
            for j in range(20)
        ]
        # fully-repetitive plants for the repetition stage — kept out
        # of the decontamination id range so they can't share grams
        # with the benchmark subset
        text = F.when(
            (F.col("id") % 997 == 0) & (F.col("id") >= n_decontam),
            F.lit(" ".join(["repword"] * 20)),
        ).otherwise(F.concat_ws(" ", *words))
        corpus_path = os.path.join(out_root, "corpus")
        t0 = time.time()
        (spark.range(0, n_docs, numPartitions=int(cpus) * 4)
         .select(F.col("id").alias("doc_id"), stratum.alias("source"),
                 text.alias("text"))
         .write.parquet(corpus_path))
        out["synth_sec"] = round(time.time() - t0, 1)
        docs = spark.read.parquet(corpus_path)

        # --- hash_sample -------------------------------------------------
        t0 = time.time()
        n_sampled = hash_sample(docs, "doc_id", 0.1).count()
        wall = time.time() - t0
        out["hash_sample_wall_sec"] = round(wall, 1)
        out["hash_sample_rows_per_sec"] = round(n_docs / wall, 1)
        out["hash_sample_selected"] = n_sampled
        mean, sigma = n_docs * 0.1, (n_docs * 0.1 * 0.9) ** 0.5
        assert abs(n_sampled - mean) < 5 * sigma, (n_sampled, mean)

        # --- stratified quota over the skewed strata ----------------------
        quota = 100_000
        t0 = time.time()
        picked = stratified_quota_sample(docs, "source", "doc_id", quota)
        counts = {r["source"]: r["n"] for r in
                  picked.groupBy("source").agg(F.count("*").alias("n"))
                  .collect()}
        wall = time.time() - t0
        out["quota_wall_sec"] = round(wall, 1)
        out["quota_rows_per_sec"] = round(n_docs / wall, 1)
        out["quota_hot_stratum_rows"] = counts.get("hot", 0)
        sizes = {r["source"]: r["n"] for r in
                 docs.groupBy("source").agg(F.count("*").alias("n"))
                 .collect()}
        for s, size in sizes.items():
            assert counts.get(s, 0) == min(quota, size), (s, counts.get(s), size)
        out["quota_strata"] = len(sizes)

        # --- token budget over the skewed strata ---------------------------
        budget = 5_000_000
        t0 = time.time()
        kept = token_budget_sample(docs.withColumn(
            "w", F.length("text")), "source", "doc_id", "w", budget)
        wsum = {r["source"]: r["s"] for r in
                kept.groupBy("source").agg(F.sum("w").alias("s")).collect()}
        wall = time.time() - t0
        out["budget_wall_sec"] = round(wall, 1)
        out["budget_rows_per_sec"] = round(n_docs / wall, 1)
        out["budget_hot_weight"] = wsum.get("hot", 0)
        assert all(s <= budget for s in wsum.values()), wsum
        # the hot stratum has far more weight than budget, so the fill
        # must come within one max-doc-length of the budget
        assert wsum["hot"] > budget - 400, wsum["hot"]

        # --- pack the whole corpus into 2048-char windows ------------------
        t0 = time.time()
        packed = pack_sequences(
            docs.withColumn("w", F.length("text")), "doc_id", "w", 2048,
            bucket_hex=3)
        agg = packed.agg(
            F.min("start_offset").alias("lo"),
            F.max(F.col("start_offset") + F.col("weight")).alias("hi"),
            F.sum("weight").alias("tot"),
            F.countDistinct("start_offset").alias("nd"),
            F.count("*").alias("n"),
        ).collect()[0]
        wall = time.time() - t0
        out["pack_wall_sec"] = round(wall, 1)
        out["pack_rows_per_sec"] = round(n_docs / wall, 1)
        out["pack_total_weight"] = agg["tot"]
        # perfect concatenation: starts at 0, ends at the weight sum,
        # all offsets distinct (with weights >= 1 that rules out any
        # gap or overlap in the packed stream)
        assert agg["lo"] == 0 and agg["hi"] == agg["tot"], agg
        assert agg["nd"] == agg["n"] == n_docs, agg

        # --- repetition stats with planted all-repeat docs -----------------
        from redisgraph_bulk_loader_spark.operators.curation import (
            repetition_stats,
        )

        n_planted = len(range((n_decontam + 996) // 997 * 997,
                              n_docs, 997))
        t0 = time.time()
        rep = repetition_stats(docs, "doc_id", "text", ngram_ns=(1,))
        flagged = rep.filter(
            (F.col("gram1_dup_chars") == F.col("gram1_total_chars"))
            & (F.col("gram1_total_chars") > 0))
        stats = flagged.agg(
            F.count("*").alias("n"),
            F.sum(((F.col("doc_id") % 997 == 0)
                   & (F.col("doc_id") >= n_decontam)).cast("long")
                  ).alias("on_plant"),
        ).collect()[0]
        wall = time.time() - t0
        out["repetition_wall_sec"] = round(wall, 1)
        out["repetition_rows_per_sec"] = round(n_docs / wall, 1)
        out["repetition_flagged"] = stats["n"]
        assert stats["n"] == stats["on_plant"] == n_planted, (
            stats, n_planted)

        # --- global line dedup with a ubiquitous footer --------------------
        from redisgraph_bulk_loader_spark.operators.dedup import dedup_lines

        footered = docs.select(
            "doc_id",
            F.concat(
                F.col("text"), F.lit("\nshared boilerplate footer line")
            ).alias("text"),
        )
        t0 = time.time()
        deduped = dedup_lines(footered, "doc_id", "text")
        agg = deduped.agg(
            F.sum("n_lines_removed").alias("rm"),
            F.count("*").alias("n"),
        ).collect()[0]
        wall = time.time() - t0
        out["lines_wall_sec"] = round(wall, 1)
        out["lines_rows_per_sec"] = round(n_docs / wall, 1)
        out["lines_removed"] = agg["rm"]
        # footer removed everywhere but its first doc; the n_planted
        # identical all-repeat first lines collapse to one
        assert agg["n"] == n_docs and agg["rm"] == (
            (n_docs - 1) + (n_planted - 1)), (agg, n_planted)

        # --- decontaminate with planted benchmark -------------------------
        sub = docs.filter(F.col("doc_id") < n_decontam)
        bench = sub.filter(F.col("doc_id") % 1000 == 0).select("doc_id", "text")
        t0 = time.time()
        flagged = decontaminate(sub, bench, "doc_id", "text", n=5) \
            .filter("contaminated").count()
        wall = time.time() - t0
        out["decontam_wall_sec"] = round(wall, 1)
        out["decontam_docs_per_sec"] = round(n_decontam / wall, 1)
        out["decontam_flagged"] = flagged
        expected = (n_decontam + 999) // 1000
        assert flagged == expected, (flagged, expected)

        out["jvm_vmhwm_mb"] = round(_vm_hwm_kb(jvm_pid) / 1024, 1)
        out["driver_vmhwm_mb"] = round(_vm_hwm_kb(os.getpid()) / 1024, 1)
        out["ok"] = True
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
