"""Explicit skew handling: salted joins and two-phase aggregation.

Hub entities / hub predicates put a large share of rows on single keys;
a vanilla groupBy/join sends every row of a hot key to one reducer.
Contract per BASELINE.json: explicit salting (AQE skew handling is the
backstop, not the contract).

- two_phase_count: groupBy(key, salt) partial -> groupBy(key) final.
  The first aggregation also benefits from map-side partial combine, so
  the shuffle carries at most (#keys x salt) rows per mapper.
- salted_join: fact-side uniform salt + dim-side salt explosion,
  equivalent results to a plain equi-join with hot keys spread
  ``salt`` ways.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_min_parallelism(df: DataFrame, target: int = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` partitions (default: the
    session's defaultParallelism) when the source provides fewer — a
    small parquet table often arrives as ONE file/partition, and any
    compute-heavy projection over it (shingling, hashing, signatures)
    would otherwise run single-task regardless of cluster size. At
    production scale the source already has many partitions and this is
    a no-op (no shuffle added). Plan-only check; triggers no job."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def two_phase_count(
    df: DataFrame, key_cols: List[str], *, salt: int = 16, count_col: str = "n"
) -> DataFrame:
    """Skew-safe groupBy(key).count() via salted partial aggregation."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=0) * salt).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count("*").alias("_pc"))
    return partial.groupBy(*key_cols).agg(F.sum("_pc").cast("long").alias(count_col))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: List[str],
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dim side exploded salt-ways and the fact side
    salted uniformly — for dims too big to broadcast joined against
    skewed facts."""
    dim_salted = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    fact_salted = fact.withColumn(
        "_salt", (F.rand(seed=0) * salt).cast("int")
    )
    return fact_salted.join(dim_salted, on + ["_salt"], how).drop("_salt")
