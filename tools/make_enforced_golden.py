"""Generate tests/golden/loader_enforced.parquet.

The golden is HAND-DERIVED from the reference's enforced-schema
semantics (entity_file.py:256-298 named-ID-as-property + namespaces,
relation_type.py:33-54 START/END namespaces, entity_file.py:49-86
typed casts, bulk_insert ID_INTEGER flag): the EXPECTED table below is
written out as literals, the engine output is asserted equal to it,
and the golden is written from the LITERALS — so the oracle is not
circular (an engine bug fails the assert instead of leaking into the
golden).

Run: PYTHONPATH=/root/repo python tools/make_enforced_golden.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIX = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "loader_enforced.parquet")


def j(d):
    return json.dumps(d, ensure_ascii=False)


# part, internal_id, key, props_json, src_internal, dst_internal, rel_type
EXPECTED = [
    # enforced nodes: namespace-prefixed keys, named ID column stored
    # as a string property, typed casts (INT/DOUBLE/BOOL/ARRAY)
    ("people_nodes", 0, "people.p1",
     j({"pid": '"p1"', "name": '"Alice"', "age": "42", "score": "1.5",
        "active": "true", "tags": "[1,2]"}), -1, -1, ""),
    ("people_nodes", 1, "people.p2",
     j({"pid": '"p2"', "name": '"Bob"', "age": "7", "score": "2.0",
        "active": "false", "tags": '["x","y"]'}), -1, -1, ""),
    ("people_nodes", 2, "people.p3",
     j({"pid": '"p3"', "name": '"Carol"', "age": "0", "score": "0.25",
        "active": "true", "tags": "[]"}), -1, -1, ""),
    # relation file: endpoints resolved through the namespaced registry
    # to dense internal ids (=QQ file order), typed edge property
    ("knows_edges", -1, "", j({"since": "2020"}), 0, 1, "KNOWS"),
    ("knows_edges", -1, "", j({"since": "2021"}), 1, 2, "KNOWS"),
    ("knows_edges", -1, "", j({"since": "2019"}), 2, 0, "KNOWS"),
    # id_type=INTEGER run: nameless ID column (not a property), keys
    # are the raw integer identifiers
    ("int_nodes", 0, "7", j({"name": '"widget"'}), -1, -1, ""),
    ("int_nodes", 1, "100", j({"name": '"gadget"'}), -1, -1, ""),
    ("int_nodes", 2, "2", j({"name": '"gizmo"'}), -1, -1, ""),
]


def engine_rows(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["kg_loader_enforced"](spark, "")
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: (t[0], t[4], t[1]),
    )


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    got = engine_rows(spark)
    exp = sorted(EXPECTED, key=lambda t: (t[0], t[4], t[1]))
    for g, e in zip(got, exp):
        assert g == e, f"\n got: {g}\n exp: {e}"
    assert len(got) == len(exp), (len(got), len(exp))
    print(f"engine output matches the {len(exp)} hand-derived rows")

    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = ["part", "internal_id", "key", "props_json",
            "src_internal", "dst_internal", "rel_type"]
    table = pa.table(
        {c: [row[i] for row in EXPECTED] for i, c in enumerate(cols)},
        schema=pa.schema([
            ("part", pa.string()), ("internal_id", pa.int64()),
            ("key", pa.string()), ("props_json", pa.string()),
            ("src_internal", pa.int64()), ("dst_internal", pa.int64()),
            ("rel_type", pa.string()),
        ]),
    )
    pq.write_table(table, OUT)
    print(f"wrote {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
