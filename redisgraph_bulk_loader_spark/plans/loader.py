"""Loader-compatibility plan: CSV node/relation files -> graph tables.

The distributed re-expression of the reference CLI's end-to-end
lifecycle (studied at /root/reference/redisgraph_bulk_loader/
bulk_insert.py:143-232): schema pass -> node pass (typing, ID dict,
dense ids) -> edge pass (endpoint resolution) -> sink.

Ordering semantics: the reference assigns internal node ids in
file-CLI-order then row-order (query_buffer.py:12-23). Row order inside
a CSV is recovered here with a per-file zipWithIndex over the raw lines
(the one RDD use in this package — a genuine need: row position IS the
reference's ordering key), then fields are parsed batch-wise with the
exact python-csv dialect the reference uses. Loader-compat inputs are
dimension-scale; the 10^12-row path is the documents pipeline.

Typing: every cell goes through the kernel (schemaless inference or
enforced cast); NULL cells become *absent* map keys
(test_no_null_values, test_bulk_loader.py:627-654).
"""

from __future__ import annotations

import csv as _csv
import io
from typing import Iterator, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import Config
from ..exceptions import CSVError, SchemaError
from ..ids import assign_dense_ids
from ..kernel.typing_kernel import TAG_NULL, canonical_literal, cast_cell, infer_cell
from ..schema import ColumnPlan, HType, parse_header
from ..sources.csv_source import _read_header

_TYPE_TAG = {
    HType.BOOL: 1, HType.DOUBLE: 2, HType.STRING: 3, HType.LONG: 4,
    HType.ARRAY: 5, HType.ID_STRING: 3, HType.ID_INTEGER: 4,
}


def _lines_with_index(
    spark: SparkSession, path: str, skip_header: bool = True
) -> DataFrame:
    """(line, row_idx) preserving file order; header dropped unless
    ``skip_header=False`` (the updater's --no-header mode)."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(
        rdd, StructType([StructField("line", StringType()),
                         StructField("row_idx", LongType())])
    )
    return df.filter(F.col("row_idx") > 0) if skip_header else df


def _logical_cells(
    spark: SparkSession, path: str, cfg: Config, skip_header: bool = True
) -> DataFrame:
    """(row_idx, cells) via a whole-file csv parse — the only correct
    reading when quoting is enabled: a quoted field may contain an
    embedded newline (the reference iterates the file object with
    csv.reader, entity_file.py:192-202, which handles them), so
    physical lines are not records. Loader-compat inputs are dim-scale
    (the reference's largest tested load is 100k rows); the single-task
    parse is bounded by that, while the 10^12-row path (documents
    pipeline, and the QUOTE_NONE default dialect where lines ARE
    records) stays distributed."""
    from pyspark.sql.types import ArrayType

    sep, quoting, esc = cfg.separator, cfg.quoting, cfg.escapechar
    whole = spark.read.text(path, wholetext=True)
    schema = StructType([
        StructField("row_idx", LongType()),
        StructField("cells", ArrayType(StringType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx, rows = [], []
            for text in pdf["value"]:
                reader = _csv.reader(
                    io.StringIO(text), delimiter=sep,
                    skipinitialspace=True, quoting=quoting, escapechar=esc,
                )
                for i, row in enumerate(reader):
                    if skip_header and i == 0:
                        continue
                    idx.append(i)
                    rows.append([str(c) for c in row])
            yield pd.DataFrame({"row_idx": idx, "cells": rows})

    return whole.mapInPandas(run, schema=schema)


#: above this input size the single-task whole-file parse (the only
#: fully-general quoted-dialect reader) is replaced by the distributed
#: quote-parity record assembly — a large CSV loaded with the CLI
#: default --quote 0 (QUOTE_MINIMAL) must not lose all parallelism or
#: OOM one executor (ADVICE r3).
WHOLE_FILE_MAX_BYTES = 32 << 20


def _input_size_bytes(spark: SparkSession, path: str) -> int:
    """Total byte size of ``path`` via the Hadoop FileSystem API (works
    for any scheme Spark can read)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(p).getLength())


def _distributed_logical_cells(
    spark: SparkSession, path: str, cfg: Config, skip_header: bool = True
) -> DataFrame:
    """(row_idx, cells) for quoted dialects WITHOUT a single-task
    whole-file parse: quoted fields may span physical lines, so records
    are reassembled by quote parity — a physical line starts a new csv
    record iff the number of unescaped quote characters before it is
    even (an odd count means we are inside an open quoted field; note
    doubled quotes ("" escaping) add 2 and correctly preserve parity).

    Jobs: one scan computing per-line quote counts + per-partition
    (start-count, parity) summaries (driver folds the tiny per-
    partition vector into global offsets — nothing scales with rows),
    one window pass assigning global record ids, one groupBy gluing
    each record's lines back together, then the usual Arrow-batched
    csv parse per record. Scales with partitions, not file size."""
    from pyspark.sql import Window
    from pyspark.sql.types import ArrayType

    sep, quoting, esc = cfg.separator, cfg.quoting, cfg.escapechar
    q = '"'

    lines = _lines_with_index(spark, path, skip_header=False).withColumn(
        "_pid", F.spark_partition_id()
    )
    cleaned = F.col("line")
    if esc:
        cleaned = F.replace(cleaned, F.lit(esc + esc), F.lit(""))
        cleaned = F.replace(cleaned, F.lit(esc + q), F.lit(""))
    from ..cache import pin

    nq = (F.length(cleaned)
          - F.length(F.replace(cleaned, F.lit(q), F.lit("")))).alias("_nq")
    # the stats aggregate and the record-assembly window both reference
    # the line scan: pin it (registry-managed — released by the
    # caller's PinScope or release_pins())
    lines = pin(lines.select("line", "row_idx", "_pid", nq))
    w = Window.partitionBy("_pid").orderBy("row_idx")
    cum_before = F.coalesce(
        F.sum("_nq").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    with_parity = lines.withColumn("_cum_before", cum_before)
    # per-partition: how many rows start a record under each
    # possible entering parity, plus the partition's total quotes
    stats = (
        with_parity.groupBy("_pid")
        .agg(
            F.min("row_idx").alias("_min_idx"),
            F.sum((F.col("_cum_before") % 2 == 0).cast("long"))
            .alias("_n_even"),
            F.sum((F.col("_cum_before") % 2 == 1).cast("long"))
            .alias("_n_odd"),
            F.sum("_nq").alias("_sum_nq"),
        )
        .collect()
    )
    stats.sort(key=lambda r: r["_min_idx"])
    offsets = []  # (pid, entering_parity, start_offset)
    parity, n_starts_total = 0, 0
    for r in stats:
        offsets.append((r["_pid"], parity, n_starts_total))
        n_starts_total += (r["_n_even"] if parity == 0 else r["_n_odd"])
        parity = (parity + int(r["_sum_nq"])) % 2
    off_df = F.broadcast(spark.createDataFrame(
        offsets, "_pid int, _epar long, _soff long"))
    cum_starts = F.sum(
        (((F.col("_epar") + F.col("_cum_before")) % 2 == 0).cast("long"))
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    records = (
        with_parity.join(off_df, "_pid")
        .withColumn("_rec", F.col("_soff") + cum_starts - 1)
        .groupBy("_rec")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("row_idx", "line"))
                    ),
                    lambda s: s["line"],
                ),
            ).alias("_text")
        )
    )
    if skip_header:
        records = records.filter(F.col("_rec") > 0)

    schema = StructType([
        StructField("row_idx", LongType()),
        StructField("cells", ArrayType(StringType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx, rows = [], []
            for rec, text in zip(pdf["_rec"], pdf["_text"]):
                reader = _csv.reader(
                    io.StringIO(text), delimiter=sep,
                    skipinitialspace=True, quoting=quoting,
                    escapechar=esc,
                )
                parsed = list(reader)
                idx.append(int(rec))
                rows.append([str(c) for c in parsed[0]] if parsed else [])
            yield pd.DataFrame({"row_idx": idx, "cells": rows})

    return records.mapInPandas(run, schema=schema)


def _record_source(
    spark: SparkSession, path: str, cfg: Config,
    whole_file_max_bytes: Optional[int] = None,
) -> DataFrame:
    """Pick the record reader for the configured dialect: distributed
    physical-line split under QUOTE_NONE (the reference default, where
    a newline always ends a record); for quoted dialects, the
    whole-file logical csv parse below ``whole_file_max_bytes`` (one
    task, exact reference dialect) and the distributed quote-parity
    assembly above it (quoted fields may span lines, but a large file
    must not funnel through a single task — ADVICE r3)."""
    if cfg.quoting == _csv.QUOTE_NONE:
        return _lines_with_index(spark, path)
    cap = (WHOLE_FILE_MAX_BYTES if whole_file_max_bytes is None
           else whole_file_max_bytes)
    if _input_size_bytes(spark, path) > cap:
        return _distributed_logical_cells(spark, path, cfg)
    return _logical_cells(spark, path, cfg)


def _parse_rows(
    lines: DataFrame, plan: ColumnPlan, cfg: Config, path: str
) -> DataFrame:
    """Parse raw lines with the reference csv dialect; validate arity;
    type every property cell through the kernel. Input is either
    (line, row_idx) physical lines or (row_idx, cells) pre-split
    logical records from _logical_cells. Output columns:
    row_idx, _key fields, props (map<string, canonical literal string>),
    plus typed id/endpoint columns."""
    n_cols = plan.column_count
    prop_cols: List[Tuple[int, str, Optional[HType]]] = [
        (i, plan.column_names[i], plan.types[i] if plan.types else None)
        for i in range(n_cols)
        if plan.column_names[i] is not None
    ]
    enforce = cfg.enforce_schema
    sep, quoting, esc = cfg.separator, cfg.quoting, cfg.escapechar
    kind, id_off = plan.kind, plan.id
    s_off, e_off = plan.start_id, plan.end_id

    out_fields = [
        StructField("row_idx", LongType()),
        StructField("props_json", StringType()),
    ]
    if kind == "node":
        out_fields.append(StructField("ext_id", StringType()))
    else:
        out_fields.append(StructField("src_id", StringType()))
        out_fields.append(StructField("dst_id", StringType()))
    schema = StructType(out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        for pdf in batches:
            out = {f.name: [] for f in schema.fields}
            if "cells" in pdf.columns:
                row_iter = zip(pdf["row_idx"], pdf["cells"])
            else:
                reader = _csv.reader(
                    io.StringIO("\n".join(pdf["line"].astype(str))),
                    delimiter=sep, skipinitialspace=True, quoting=quoting,
                    escapechar=esc,
                )
                row_iter = zip(pdf["row_idx"], reader)
            for row_idx, row in row_iter:
                if len(row) != n_cols:
                    raise CSVError(
                        f"{path}:{int(row_idx)} Expected {n_cols} columns, "
                        f"encountered {len(row)}"
                    )
                props = {}
                for off, name, htype in prop_cols:
                    raw = row[off]
                    if enforce:
                        cell = cast_cell(raw, _TYPE_TAG[htype])
                    else:
                        cell = infer_cell(raw)
                    if cell.t != TAG_NULL:
                        props[name] = canonical_literal(cell)
                out["row_idx"].append(int(row_idx))
                out["props_json"].append(json.dumps(props, ensure_ascii=False))
                # identifiers keep trailing whitespace: the reference only
                # skips leading space (skipinitialspace), so 'a' and 'a '
                # are distinct node keys (entity_file.py csv dialect)
                if kind == "node":
                    out["ext_id"].append(row[id_off])
                else:
                    out["src_id"].append(row[s_off])
                    out["dst_id"].append(row[e_off])
            yield pd.DataFrame(out)

    return lines.mapInPandas(run, schema=schema)


def _ns_prefixed(col, namespace: Optional[str]):
    if namespace:
        return F.concat(F.lit(namespace + "."), col)
    return col


class BulkGraph:
    """Result bundle: nodes / edges / registry DataFrames."""

    def __init__(self, nodes, edges, registry, node_counts, edge_counts,
                 skipped_edges):
        self.nodes = nodes
        self.edges = edges
        self.registry = registry
        self.node_counts = node_counts
        self.edge_counts = edge_counts
        self.skipped_edges = skipped_edges


def bulk_insert(
    spark: SparkSession,
    node_files: Sequence[Tuple[str, Optional[str]]],
    relation_files: Sequence[Tuple[str, Optional[str]]] = (),
    config: Optional[Config] = None,
) -> BulkGraph:
    """(path, label_or_None) lists -> graph tables.

    Matches the reference lifecycle: all node files first (complete
    registry), then relation files. Duplicate identifiers: last wins in
    the registry, every row still becomes a node; strict mode fails
    (label.py:51-61).
    """
    cfg = config or Config()
    if relation_files:
        cfg.store_node_identifiers = True

    node_frames = []
    plans: List[ColumnPlan] = []
    for file_idx, (path, label) in enumerate(node_files):
        header = _read_header(path, cfg.separator, cfg.escapechar)
        entity = label or path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        plan = parse_header(
            header, "node", entity,
            enforce_schema=cfg.enforce_schema, id_type=cfg.id_type,
            store_node_identifiers=cfg.store_node_identifiers, source=path,
        )
        plans.append(plan)
        parsed = _parse_rows(_record_source(spark, path, cfg), plan, cfg, path)
        node_frames.append(
            parsed.select(
                F.lit(file_idx).alias("file_idx"),
                "row_idx",
                F.lit(plan.entity_str).alias("label"),
                _ns_prefixed(F.col("ext_id"), plan.id_namespace).alias("key"),
                "props_json",
            )
        )
    all_nodes = node_frames[0]
    for f in node_frames[1:]:
        all_nodes = all_nodes.unionByName(f)

    # dense internal ids in (file, row) order — reference counter parity
    with_ids = assign_dense_ids(all_nodes, ["file_idx", "row_idx"]).cache()

    # duplicate identifiers
    if cfg.store_node_identifiers:
        dups = (
            with_ids.groupBy("key").agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
        )
        if not cfg.skip_invalid_nodes:
            sample = dups.limit(1).collect()
            if sample:
                raise SchemaError(
                    f"Node identifier '{sample[0]['key']}' was used "
                    f"multiple times"
                )
    registry = (
        with_ids.groupBy("key").agg(F.max("internal_id").alias("internal_id"))
    )  # last occurrence wins (max internal id == latest row)

    nodes = with_ids.select("internal_id", "label", "key", "props_json")
    node_counts = nodes.groupBy("label").agg(F.count("*").alias("n"))

    edges = None
    skipped = 0
    edge_frames = []
    for path, rtype in relation_files:
        header = _read_header(path, cfg.separator, cfg.escapechar)
        entity = rtype or path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        plan = parse_header(
            header, "relation", entity,
            enforce_schema=cfg.enforce_schema, id_type=cfg.id_type,
            source=path,
        )
        parsed = _parse_rows(_record_source(spark, path, cfg), plan, cfg, path)
        edge_frames.append(
            parsed.select(
                F.lit(plan.entity_str).alias("rel_type"),
                _ns_prefixed(F.col("src_id"), plan.start_namespace).alias("src_key"),
                _ns_prefixed(F.col("dst_id"), plan.end_namespace).alias("dst_key"),
                "props_json",
            )
        )
    if edge_frames:
        from ..operators.endpoints import resolve_endpoints

        all_edges = edge_frames[0]
        for f in edge_frames[1:]:
            all_edges = all_edges.unionByName(f)
        reg = registry.select(F.col("key").alias("ext_id"), "internal_id")
        # eager_check: the reference CLI fails at load time with a typed
        # error (relation_type.py:74-88); loader inputs are dim-scale,
        # so the extra validation job is bounded
        resolved = resolve_endpoints(
            all_edges, reg,
            src_col="src_key", dst_col="dst_key",
            skip_invalid=cfg.skip_invalid_edges,
            broadcast_registry=True, eager_check=True,
        )
        if cfg.skip_invalid_edges:
            skipped = all_edges.count() - resolved.count()
        edges = resolved.select(
            "src_internal", "dst_internal", "rel_type", "props_json"
        )
    edge_counts = (
        edges.groupBy("rel_type").agg(F.count("*").alias("n"))
        if edges is not None else None
    )
    return BulkGraph(nodes, edges, registry, node_counts, edge_counts, skipped)
