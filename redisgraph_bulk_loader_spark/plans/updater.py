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

from pyspark.sql import DataFrame
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
