"""Arrow-vectorized Spark bindings for the typing kernel.

Design: Spark CSV inference is never on the data path — inputs are read
all-string and typed by these UDFs, because Spark's ``cast`` /
``try_cast`` cannot replicate the Python ``int()``/``float()``
accept-sets, the int64-overflow->double fallthrough, or
``ast.literal_eval`` array semantics the reference pins
(/root/reference/redisgraph_bulk_loader/entity_file.py:49-176).

The UDFs are scalar pandas UDFs (Arrow batch transport, one Python call
per ~10k-row batch — no per-row Python at the Spark row level). At
100 TB these run embarrassingly parallel per input split: no shuffle,
no state, and whole-stage codegen handles everything around them.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .typing_kernel import cast_cell, infer_cell

# Tagged-union value struct: exactly one payload field non-null, tag `t`
# reuses the reference Type enum numbering (entity_file.py:15-30).
TYPED_VALUE_SCHEMA = StructType(
    [
        StructField("t", ByteType(), False),
        StructField("b", BooleanType(), True),
        StructField("d", DoubleType(), True),
        StructField("l", LongType(), True),
        StructField("s", StringType(), True),
        StructField("a", StringType(), True),
    ]
)


def _cells_to_frame(cells) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "t": pd.array([c.t for c in cells], dtype="int8"),
            "b": pd.array([c.b for c in cells], dtype="boolean"),
            "d": pd.array([c.d for c in cells], dtype="Float64"),
            "l": pd.array([c.l for c in cells], dtype="Int64"),
            "s": pd.array([c.s for c in cells], dtype="string"),
            "a": pd.array([c.a for c in cells], dtype="string"),
        }
    )


@pandas_udf(TYPED_VALUE_SCHEMA)
def _infer_udf(col: pd.Series) -> pd.DataFrame:
    return _cells_to_frame([infer_cell(v) for v in col])


def infer_col(col: Column) -> Column:
    """Schemaless per-cell inference -> tagged-union struct column."""
    return _infer_udf(col)


def cast_col(col: Column, declared_tag: int) -> Column:
    """Enforced-schema cast -> tagged-union struct column.

    Raises SchemaError inside the task (job fails) on violation,
    matching the reference's fail-fast (entity_file.py:83,95,104,117).
    """

    @pandas_udf(TYPED_VALUE_SCHEMA)
    def _cast_udf(c: pd.Series) -> pd.DataFrame:
        return _cells_to_frame([cast_cell(v, declared_tag) for v in c])

    return _cast_udf(col)


def typed_value_to_sql_expr(struct_col: str) -> Column:
    """Render a tagged-union struct column to its canonical literal
    string JVM-side (no Python) — for comparisons / golden hashing."""
    c = F.col(struct_col)
    return (
        F.when(c["t"] == 0, F.lit("null"))
        .when(c["t"] == 1, F.when(c["b"], F.lit("true")).otherwise(F.lit("false")))
        .when(c["t"] == 4, c["l"].cast("string"))
        .when(c["t"] == 2, c["d"].cast("string"))
        .when(c["t"] == 3, F.concat(F.lit('"'), c["s"], F.lit('"')))
        .otherwise(c["a"])
    )
