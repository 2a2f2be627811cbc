"""Bulk-update compatibility: batched incremental graph updates.

The reference's updater (studied at /root/reference/
redisgraph_bulk_loader/bulk_update.py) reads a CSV, quotes each cell
into a Cypher literal (quote_string, :59-74), batches rows by size, and
runs ``UNWIND $rows AS row <query>`` per batch — with compile-time
validation via GRAPH.EXPLAIN before any data moves (:76-80) and
incremental commit semantics (partial failure leaves prior batches
applied, README.md:205).

Spark mapping:
- ``quote_cell``: the documented *intent* of quote_string — numerics,
  booleans, and bracketed arrays pass through; everything else (not
  already quoted) is double-quoted. (The reference contains a real bug
  — ``cell.lower != "]"`` compares a bound method, always truthy
  (bulk_update.py:67) — we implement the documented intent, not the
  bug.)
- ``validate_update_plan``: dry-run analysis of the update's plan on an
  empty frame — the GRAPH.EXPLAIN analogue; catches schema errors
  before any batch is applied.
- ``apply_updates``: micro-batched MERGE into the nodes table via
  incremental_graph_update; each batch is an independent commit
  (incremental semantics preserved).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.stream import incremental_graph_update


def _is_numeric(v: str) -> bool:
    try:
        float(v)
        return True
    except ValueError:
        return False


def quote_cell(cell: str) -> str:
    """Render one CSV cell as a literal for the row-parameter list."""
    v = cell.strip()
    if v == "":
        return "null"
    if _is_numeric(v):
        return v
    if v.lower() in ("true", "false"):
        return v.lower()
    if v.startswith("[") and v.endswith("]"):
        return v
    if (v.startswith('"') and v.endswith('"')) or (
        v.startswith("'") and v.endswith("'")
    ):
        return v
    return f'"{v}"'


def quote_col(col):
    """JVM-side column form of quote_cell (whole-stage-codegen path)."""
    v = F.trim(col)
    numeric = v.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
    boolean = F.lower(v).isin("true", "false")
    arr = v.startswith("[") & v.endswith("]")
    quoted = (v.startswith('"') & v.endswith('"')) | (
        v.startswith("'") & v.endswith("'")
    )
    return (
        F.when(v == "", F.lit("null"))
        .when(numeric, v)
        .when(boolean, F.lower(v))
        .when(arr | quoted, v)
        .otherwise(F.concat(F.lit('"'), v, F.lit('"')))
    )


def validate_update_plan(existing: DataFrame, updates: DataFrame,
                         key_cols: List[str]) -> None:
    """Compile-time validation (GRAPH.EXPLAIN analogue): analyze the
    merged plan against an empty slice of the updates; raises
    AnalysisException on schema mismatch before any data is written."""
    empty = updates.limit(0)
    incremental_graph_update(existing, empty, key_cols).explain(mode="cost")


def apply_updates(
    existing: DataFrame,
    updates: DataFrame,
    key_cols: List[str],
    *,
    max_rows_per_batch: int = 100_000,
    order_col: str = None,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Batched MERGE: split updates into size-bounded batches and apply
    sequentially in input order (the reference's max-token-size batching
    analogue, bulk_update.py:106-119). Returns the final nodes frame.

    Batch membership is pinned by an eager localCheckpoint on the batched
    frame, so it cannot change across plan re-evaluation or task retry,
    and batches follow ``order_col`` (cross-batch last-wins == sequential
    row order). Lineage is re-checkpointed every ``checkpoint_every``
    batches so hundreds of stacked MERGE plans don't accumulate.

    Update CSVs are dim-scale in the reference (<= the 100k-row largest
    tested load); the single-partition row_number here is bounded by that,
    not by the fact tables.
    """
    from pyspark.sql import Window

    if order_col is None:
        if "row_idx" in updates.columns:
            order_col = "row_idx"
        else:
            # Partition-ordered surrogate for file order; pinned below.
            updates = updates.withColumn(
                "_row_idx", F.monotonically_increasing_id())
            order_col = "_row_idx"
    w = Window.orderBy(F.col(order_col))
    batched = updates.withColumn(
        "_b",
        ((F.row_number().over(w) - F.lit(1)) / F.lit(max_rows_per_batch))
        .cast("long"),
    ).localCheckpoint(eager=True)
    n_batches = (batched.agg(F.max("_b")).first()[0] or 0) + 1
    if n_batches == 1:
        return incremental_graph_update(
            existing, batched.drop("_b"), key_cols, order_col=order_col)
    current = existing
    for b in range(n_batches):
        batch = batched.filter(F.col("_b") == b).drop("_b")
        current = incremental_graph_update(current, batch, key_cols,
                                           order_col=order_col)
        if (b + 1) % checkpoint_every == 0 and b + 1 < n_batches:
            current = current.localCheckpoint(eager=False)
    return current


# ---------------------------------------------------------------------------
# UNWIND query-template machinery (bulk_update.py:37 parity)
# ---------------------------------------------------------------------------

def compose_update_query(query: str, variable_name: str = "row") -> str:
    """The reference's query composition, verbatim semantics: the user
    fragment runs once per row with the row bound to ``variable_name``
    (bulk_update.py:37 ``" ".join(["UNWIND $rows AS", variable_name,
    query])``). Returned for display/lineage; execution happens in
    run_update_query."""
    return " ".join(["UNWIND $rows AS", variable_name, query])


def read_update_csv(
    spark: SparkSession,
    path: str,
    *,
    separator: str = ",",
    no_header: bool = False,
    variable_name: str = "row",
) -> DataFrame:
    """Read an update CSV the way the reference does
    (bulk_update.py:82-104: QUOTE_NONE, backslash escape,
    skipinitialspace, optional header skip) into
    ``(row_idx, <variable_name>: array<string>)`` — positional cells,
    so SQL fragments use 0-based ``<var>[i]`` exactly like the
    reference's Cypher ``row[i]``."""
    import csv as _csv
    import io
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    from .loader import _lines_with_index

    rdd_df = _lines_with_index(spark, path, skip_header=not no_header)
    schema = StructType([
        StructField("row_idx", LongType()),
        StructField(variable_name, ArrayType(StringType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx, rows = [], []
            reader = _csv.reader(
                io.StringIO("\n".join(pdf["line"].astype(str))),
                delimiter=separator, skipinitialspace=True,
                quoting=_csv.QUOTE_NONE, escapechar="\\",
            )
            for row_idx, row in zip(pdf["row_idx"], reader):
                idx.append(int(row_idx))
                rows.append(list(row))
            yield pd.DataFrame({"row_idx": idx, variable_name: rows})

    return rdd_df.mapInPandas(run, schema=schema)


def run_update_query(
    spark: SparkSession,
    existing: DataFrame,
    rows: DataFrame,
    query: str,
    *,
    variable_name: str = "row",
    key_cols: List[str],
    max_rows_per_batch: int = 100_000,
) -> DataFrame:
    """Spark analogue of the reference's ``UNWIND $rows AS <var>
    <query>`` (bulk_update.py:37,106-119): ``query`` is an ANSI-SQL
    select list over the row variable — e.g.
    ``"{v}[0] AS ext_id, CAST({v}[1] AS INT) AS age"`` with ``{v}`` =
    ``variable_name`` and 0-based cell access, mirroring Cypher's
    ``row[0]`` — projected once per row and MERGEd into ``existing``
    on ``key_cols`` in row order (last occurrence wins).

    Documented restriction vs the reference: the fragment is a row
    projection + MERGE, not arbitrary Cypher graph mutation; that is
    the shape every reference test exercises (test_bulk_update.py).

    Compile-time validation (the GRAPH.EXPLAIN analogue,
    bulk_update.py:76-80) happens when the projection is analyzed —
    a malformed fragment raises AnalysisException before any batch is
    applied."""
    view = "_rgbl_update_rows"
    rows.createOrReplaceTempView(view)
    projected = spark.sql(f"SELECT {query}, row_idx FROM {view}")
    projected.limit(0).columns  # force analysis: fail before any write
    return apply_updates(
        existing, projected, key_cols,
        max_rows_per_batch=max_rows_per_batch, order_col="row_idx",
    )
