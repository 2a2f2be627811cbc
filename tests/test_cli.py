"""CLI parity tests: the installed console-script surface driven the way
a reference user would drive it (bulk_insert.py:50-162 flags over the
reference's own example/ fixtures), plus the UNWIND query-template
machinery (bulk_update.py:37,129-206)."""

import json
import os
import subprocess
import sys

import pytest

REF_EXAMPLE = "/root/reference/example"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(func, args, cwd):
    """Invoke a cli entry point in a subprocess (own Spark JVM)."""
    code = (
        "import sys; sys.path.insert(0, {repo!r}); "
        "from redisgraph_bulk_loader_spark.cli import {func}; "
        "sys.exit({func}(sys.argv[1:]))"
    ).format(repo=REPO, func=func)
    return subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, cwd=cwd, timeout=600,
        env={**os.environ, "PYTHONPATH": REPO},
    )


@pytest.mark.skipif(not os.path.isdir(REF_EXAMPLE),
                    reason="reference example fixtures unavailable")
class TestInsertCLI:
    def test_social_graph_end_to_end(self, tmp_path):
        """The reference README's example invocation shape:
        rgbl-spark-insert GRAPH --nodes Person.csv --nodes Country.csv
        --relations KNOWS.csv --relations VISITED.csv."""
        out = tmp_path / "social_graph"
        r = _run_cli("insert_main", [
            "social", "--master", "local[4]",
            "--nodes", f"{REF_EXAMPLE}/Person.csv",
            "--nodes", f"{REF_EXAMPLE}/Country.csv",
            "--relations", f"{REF_EXAMPLE}/KNOWS.csv",
            "--relations", f"{REF_EXAMPLE}/VISITED.csv",
            "--output", str(out),
            "--index", "Person:name",
            "--full-text-index", "Person:status",
        ], cwd=str(tmp_path))
        assert r.returncode == 0, r.stderr[-2000:]
        manifest = json.loads((out / "_manifest.json").read_text())
        assert set(manifest["tables"]) >= {"nodes", "edges", "node_registry"}
        # reference example: 14 Person rows + 13 Country rows
        assert "27 nodes created" in r.stdout
        # KNOWS 13 + VISITED 35 edges
        assert "48 relations created" in r.stdout
        # index DDL recorded post-load (bulk_insert.py:235-263 analogue)
        idx = manifest["requested_indexes"]
        assert {"label": "Person", "property": "name", "kind": "range"}.items() \
            <= idx[0].items()
        assert idx[1]["kind"] == "fulltext"

        # fresh-graph guard: second run against the same catalog refuses
        r2 = _run_cli("insert_main", [
            "social", "--master", "local[4]",
            "--nodes", f"{REF_EXAMPLE}/Person.csv",
            "--output", str(out),
        ], cwd=str(tmp_path))
        assert r2.returncode == 1
        assert "already contains a graph" in r2.stderr

    def test_requires_node_file(self, tmp_path):
        r = _run_cli("insert_main", ["g"], cwd=str(tmp_path))
        assert r.returncode == 1
        assert "At least one node file" in r.stderr


class TestUpdateMachinery:
    def test_read_update_csv_no_header_and_separator(self, spark, tmp_path):
        from redisgraph_bulk_loader_spark.plans.updater import read_update_csv

        p = tmp_path / "u.csv"
        p.write_text("a|1\nb|2\n")
        rows = read_update_csv(spark, str(p), separator="|", no_header=True)
        got = sorted((r.row_idx, list(r.row)) for r in rows.collect())
        assert got == [(0, ["a", "1"]), (1, ["b", "2"])]

    def test_read_update_csv_header_skipped(self, spark, tmp_path):
        from redisgraph_bulk_loader_spark.plans.updater import read_update_csv

        p = tmp_path / "u.csv"
        p.write_text("id,val\na,1\n")
        rows = read_update_csv(spark, str(p))
        assert [list(r.row) for r in rows.collect()] == [["a", "1"]]

    def test_compose_matches_reference_shape(self):
        from redisgraph_bulk_loader_spark.plans.updater import (
            compose_update_query,
        )

        # bulk_update.py:37 — " ".join(["UNWIND $rows AS", var, query])
        assert compose_update_query("MERGE (n {v: row[0]})") == \
            "UNWIND $rows AS row MERGE (n {v: row[0]})"
        assert compose_update_query("RETURN r", "r") == \
            "UNWIND $rows AS r RETURN r"

    def test_run_update_query_merges_in_row_order(self, spark, tmp_path):
        from redisgraph_bulk_loader_spark.plans.updater import (
            read_update_csv,
            run_update_query,
        )

        p = tmp_path / "u.csv"
        # key 'a' updated twice: later row must win (file order)
        p.write_text("id,val\na,first\nb,bee\na,last\n")
        existing = spark.createDataFrame(
            [("a", "old"), ("z", "zed")], "ext_id string, val string"
        )
        rows = read_update_csv(spark, str(p))
        merged = run_update_query(
            spark, existing, rows,
            "row[0] AS ext_id, row[1] AS val", key_cols=["ext_id"],
        )
        got = {r.ext_id: r.val for r in merged.collect()}
        assert got == {"a": "last", "b": "bee", "z": "zed"}

    def test_run_update_query_invalid_fragment_fails_before_write(
        self, spark, tmp_path
    ):
        from redisgraph_bulk_loader_spark.plans.updater import (
            read_update_csv,
            run_update_query,
        )

        p = tmp_path / "u.csv"
        p.write_text("id\na\n")
        existing = spark.createDataFrame([("a",)], "ext_id string")
        rows = read_update_csv(spark, str(p))
        with pytest.raises(Exception):  # AnalysisException on bad fragment
            run_update_query(
                spark, existing, rows,
                "nonexistent_fn(row[0]) AS ext_id", key_cols=["ext_id"],
            )

    def test_variable_name_respected(self, spark, tmp_path):
        from redisgraph_bulk_loader_spark.plans.updater import (
            read_update_csv,
            run_update_query,
        )

        p = tmp_path / "u.csv"
        p.write_text("id,val\nk,42\n")
        existing = spark.createDataFrame([("x", 0)], "ext_id string, v int")
        rows = read_update_csv(spark, str(p), variable_name="r")
        merged = run_update_query(
            spark, existing, rows,
            "r[0] AS ext_id, CAST(r[1] AS INT) AS v",
            variable_name="r", key_cols=["ext_id"],
        )
        got = {r.ext_id: r.v for r in merged.collect()}
        assert got == {"x": 0, "k": 42}


class TestCatalogIndexDDL:
    def test_record_and_list(self, spark, tmp_path):
        from redisgraph_bulk_loader_spark.materialize import GraphCatalog

        cat = GraphCatalog(spark, str(tmp_path / "cat"))
        cat.record_index("Person", "age")
        cat.record_index("Doc", "text", kind="fulltext")
        got = cat.requested_indexes()
        assert [(g["label"], g["property"], g["kind"]) for g in got] == [
            ("Person", "age", "range"), ("Doc", "text", "fulltext")
        ]
        with pytest.raises(ValueError):
            cat.record_index("X", "y", kind="bitmap")
