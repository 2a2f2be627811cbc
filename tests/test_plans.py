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

    def test_whole_stage_codegen_on_agg(self, spark):
        li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
        agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
        agg.collect()  # AQE shows codegen spans only in the final plan
        plan = plan_of(agg)
        # AQE's final-plan toString marks whole-stage codegen as "*(n)"
        assert "isFinalPlan=true" in plan
        assert "*(1)" in plan or "*(2)" in plan or "WholeStageCodegen" in plan
