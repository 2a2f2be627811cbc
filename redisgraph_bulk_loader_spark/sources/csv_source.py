"""Loader-compatibility CSV source (dialect unit-test harness).

Reproduces the reference's csv dialect (studied at
/root/reference/redisgraph_bulk_loader/entity_file.py:192-233,
config.py): delimiter option, leading-whitespace skip, QUOTE_NONE by
default (quote characters stay literal — they drive type inference),
optional escape char, and per-row arity validation (field count must
equal header count, else CSVError).

Scope note: the production loader lifecycle (plans/loader.py) reads
records through its own ``_record_source`` (row order IS the
reference's id-assignment key, which spark.read.csv cannot provide);
this module's ``read_entity_csv`` exists to pin the Spark-native-csv
mapping of the dialect (quote="", PERMISSIVE + corrupt-record arity
checks) and is exercised by tests only. ``_read_header`` is the shared
driver-side header reader both paths use.

Spark mapping: ``spark.read.csv`` with an explicit all-string schema
(Spark's own inference is never on the data path — typing belongs to
the kernel), ``quote=""`` for QUOTE_NONE, PERMISSIVE mode with a
corrupt-record column for arity checking. Strict mode fails the job on
the first bad row (reference behavior); skip mode counts and drops.
"""

from __future__ import annotations

import csv as _csv
import io
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..exceptions import CSVError
from ..schema import ColumnPlan, parse_header

_CORRUPT = "_corrupt_record"


@dataclass
class CsvReadResult:
    plan: ColumnPlan
    df: DataFrame  # columns: c0..c{n-1} (all string), plus _row_idx
    dropped: int  # arity-violating rows dropped (skip mode only)


def _read_header(path: str, separator: str, escapechar: Optional[str]) -> List[str]:
    """Driver-side header read using the exact reference dialect
    (python csv with QUOTE_NONE + skipinitialspace)."""
    with io.open(path, "rt") as f:
        reader = _csv.reader(
            f,
            delimiter=separator,
            skipinitialspace=True,
            quoting=_csv.QUOTE_NONE,
            escapechar=escapechar,
        )
        return next(reader)


def read_entity_csv(
    spark: SparkSession,
    path: str,
    kind: str,
    *,
    entity_str: Optional[str] = None,
    separator: str = ",",
    escapechar: Optional[str] = None,
    enforce_schema: bool = False,
    id_type: str = "STRING",
    store_node_identifiers: bool = True,
    strict_arity: bool = True,
) -> CsvReadResult:
    """Read one node/relation CSV into an all-string DataFrame plus its
    ColumnPlan. Generic column names c0..c{n-1} keep positional
    semantics (the plan maps positions to property names)."""
    entity = entity_str or os.path.splitext(os.path.basename(path))[0]
    header = _read_header(path, separator, escapechar)
    plan = parse_header(
        header,
        kind,
        entity,
        enforce_schema=enforce_schema,
        id_type=id_type,
        store_node_identifiers=store_node_identifiers,
        source=path,
    )

    n = plan.column_count
    schema = StructType(
        [StructField(f"c{i}", StringType(), True) for i in range(n)]
        + [StructField(_CORRUPT, StringType(), True)]
    )
    df = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("sep", separator)
        .option("quote", "")
        .option("escape", escapechar or "\u0000")
        .option("ignoreLeadingWhiteSpace", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("enforceSchema", "true")
        .csv(path)
    )
    # Spark disallows querying only the corrupt-record column from a raw
    # CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); cache the parsed frame
    # before the validity split. The loader-compat CSV path is dimension
    # -scale input — the 100 TB path is the documents source.
    from ..cache import pin

    df = pin(df)
    bad = df.filter(F.col(_CORRUPT).isNotNull())
    dropped = 0
    if strict_arity:
        first_bad = bad.select(_CORRUPT).limit(1).collect()
        if first_bad:
            raise CSVError(
                f"{path}: Expected {n} columns, encountered a row with a "
                f"different count: '{first_bad[0][0]}'"
            )
    else:
        dropped = bad.count()
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    # Cells are returned RAW: per-field stripping is the typing
    # kernel's job (it strips property cells before inference while
    # identifiers keep trailing whitespace, matching the reference
    # dialect — see kernel/typing_kernel.py and plans/loader.py).
    return CsvReadResult(plan=plan, df=good, dropped=dropped)
