"""Header-planner tests, transliterated from the reference's unit suite
(/root/reference/test/test_label.py:15-51,
test/test_relation_type.py:15-56) plus enforced-schema corner cases from
entity_file.py:256-298.
"""

import pytest

from redisgraph_bulk_loader_spark.exceptions import CSVError, SchemaError
from redisgraph_bulk_loader_spark.schema import HType, parse_header


class TestNodeSchemaless:
    def test_private_id(self):
        # test_label.py: `_ID,prop` -> column_names == [None, "prop"]
        plan = parse_header(["_ID", "prop"], "node", "L")
        assert plan.column_names == [None, "prop"]
        assert plan.prop_count == 1
        assert plan.id == 0

    def test_public_id_is_property(self):
        plan = parse_header(["name", "age"], "node", "Person")
        assert plan.column_names == ["name", "age"]
        assert plan.prop_count == 2
        assert plan.id == 0

    def test_names_stripped(self):
        plan = parse_header([" name ", " age"], "node", "P")
        assert plan.column_names == ["name", "age"]


class TestNodeEnforced:
    def test_id_namespace(self):
        # test_label.py: `id:ID(IDNamespace),prop:STRING`
        plan = parse_header(
            ["id:ID(IDNamespace)", "prop:STRING"], "node", "L", enforce_schema=True
        )
        assert plan.id_namespace == "IDNamespace"
        assert plan.id == 0
        # named ID counts as a property: prop_count == 2
        assert plan.prop_count == 2
        assert plan.column_names == ["id", "prop"]

    def test_nameless_id_not_property(self):
        plan = parse_header([":ID", "prop:STRING"], "node", "L", enforce_schema=True)
        assert plan.column_names == [None, "prop"]
        assert plan.prop_count == 1

    def test_exactly_one_id_required(self):
        with pytest.raises(SchemaError):
            parse_header(["a:STRING"], "node", "L", enforce_schema=True)
        with pytest.raises(SchemaError):
            parse_header([":ID", "b:ID"], "node", "L", enforce_schema=True)

    def test_no_id_needed_without_edges(self):
        plan = parse_header(
            ["a:STRING"], "node", "L", enforce_schema=True,
            store_node_identifiers=False,
        )
        assert plan.prop_count == 1

    def test_id_type_integer(self):
        plan = parse_header(
            ["id:ID", "p:STRING"], "node", "L", enforce_schema=True,
            id_type="INTEGER",
        )
        assert plan.types[0] == HType.ID_INTEGER

    def test_ignore_column(self):
        plan = parse_header(
            ["str_col:STRING", "ignore_col:IGNORE", ":ID"],
            "node", "L", enforce_schema=True,
        )
        assert plan.column_names == ["str_col", None, None]
        assert plan.prop_count == 1

    def test_multi_colon_is_csv_error(self):
        with pytest.raises(CSVError):
            parse_header(["a:b:STRING", ":ID"], "node", "L", enforce_schema=True)

    def test_unknown_type(self):
        with pytest.raises(SchemaError):
            parse_header(["a:WIBBLE", ":ID"], "node", "L", enforce_schema=True)

    def test_nameless_value_column_rejected(self):
        with pytest.raises(SchemaError):
            parse_header([":STRING", ":ID"], "node", "L", enforce_schema=True)

    def test_aliases(self):
        plan = parse_header(
            ["a:INT", "b:FLOAT", "c:BOOLEAN", ":ID"],
            "node", "L", enforce_schema=True,
        )
        assert plan.types[:3] == [HType.LONG, HType.DOUBLE, HType.BOOL]


class TestRelation:
    def test_schemaless(self):
        # test_relation_type.py: src/dst at cols 0/1, never properties
        plan = parse_header(["src", "dest", "relation"], "relation", "KNOWS")
        assert plan.start_id == 0
        assert plan.end_id == 1
        assert plan.column_names == [None, None, "relation"]
        assert plan.prop_count == 1

    def test_schemaless_too_few_columns(self):
        with pytest.raises(CSVError):
            parse_header(["only"], "relation", "R")

    def test_enforced_any_column_order(self):
        # END may come first (test_relation_type.py enforced case)
        plan = parse_header(
            [":END_ID(Post)", "w:INT", ":START_ID(User)"],
            "relation", "R", enforce_schema=True,
        )
        assert plan.end_id == 0
        assert plan.start_id == 2
        assert plan.start_namespace == "User"
        assert plan.end_namespace == "Post"
        assert plan.prop_count == 1

    def test_enforced_requires_both_endpoints(self):
        with pytest.raises(SchemaError):
            parse_header([":START_ID", "w:INT"], "relation", "R", enforce_schema=True)
        with pytest.raises(SchemaError):
            parse_header(
                [":START_ID", ":START_ID", ":END_ID"],
                "relation", "R", enforce_schema=True,
            )
