"""Typing-kernel parity tests.

Semantics pinned by the reference test suite
(/root/reference/test/test_bulk_loader.py:421-467 mixed types, :548-596
enforced schema, :627-654 nulls, :712-803 arrays) and the encoder
source (entity_file.py:49-176).
"""

import struct

import pytest

from redisgraph_bulk_loader_spark.exceptions import SchemaError
from redisgraph_bulk_loader_spark.kernel import (
    TAG_ARRAY,
    TAG_BOOL,
    TAG_DOUBLE,
    TAG_LONG,
    TAG_NULL,
    TAG_STRING,
    canonical_literal,
    cast_cell,
    encode_cell_binary,
    infer_cell,
)


class TestInference:
    def test_long(self):
        assert infer_cell("5") == (TAG_LONG, None, None, 5, None, None)
        assert infer_cell("-12").l == -12
        assert infer_cell("+7").l == 7
        assert infer_cell("1_000").l == 1000  # Python int() accepts underscores
        assert infer_cell(" 42 ").l == 42  # stripped first

    def test_int64_overflow_falls_to_double(self):
        # entity_file.py:141-145 — struct.error on 'q' pack -> float path
        big = str(2**63)
        cell = infer_cell(big)
        assert cell.t == TAG_DOUBLE
        assert cell.d == float(2**63)
        assert infer_cell(str(-(2**63))).t == TAG_LONG  # exactly fits
        assert infer_cell(str(-(2**63) - 1)).t == TAG_DOUBLE

    def test_double(self):
        assert infer_cell("0.2").d == 0.2
        assert infer_cell("1e3").d == 1000.0
        assert infer_cell("1.").d == 1.0
        assert infer_cell(".5").d == 0.5

    def test_nonfinite_falls_to_string(self):
        # entity_file.py:150-152 — NaN/Inf parse but are rejected
        assert infer_cell("nan").t == TAG_STRING
        assert infer_cell("inf").t == TAG_STRING
        assert infer_cell("-Infinity").t == TAG_STRING

    def test_bool(self):
        assert infer_cell("true").b is True
        assert infer_cell("False").b is False
        assert infer_cell("TRUE").b is True

    def test_string(self):
        assert infer_cell("string_prop_1").s == "string_prop_1"
        assert infer_cell("notnull").s == "notnull"

    def test_quoted_numeric_stays_string(self):
        # QUOTE_NONE keeps quotes literal: "30165" is a string
        # (README.md:94, example2/Robots.csv)
        cell = infer_cell('"30165"')
        assert cell.t == TAG_STRING
        assert cell.s == '"30165"'

    def test_null(self):
        assert infer_cell("").t == TAG_NULL
        assert infer_cell("   ").t == TAG_NULL
        assert infer_cell(None).t == TAG_NULL

    def test_mixed_column_semantics(self):
        # test_bulk_loader.py:421-467: column `mixed` holds
        # "string_prop_1", "notnull", 100 across rows
        assert infer_cell("string_prop_1").t == TAG_STRING
        assert infer_cell("notnull").t == TAG_STRING
        assert infer_cell("100").t == TAG_LONG

    def test_utf8(self):
        assert infer_cell("Straße").s == "Straße"
        assert infer_cell("中國的").s == "中國的"

    def test_array_inferred(self):
        # test_bulk_loader.py:712-773: element-wise re-inference
        cell = infer_cell("[1, 0.2, 'nested_str', False]")
        assert cell.t == TAG_ARRAY
        assert cell.a == '[1,0.2,"nested_str",false]'

    def test_array_nested(self):
        cell = infer_cell("['prop1', ['nested_1', 'nested_2'], 5]")
        assert cell.t == TAG_ARRAY
        assert cell.a == '["prop1",["nested_1","nested_2"],5]'

    def test_array_parse_error_falls_to_string(self):
        # entity_file.py:163-168
        cell = infer_cell("[not a literal")
        assert cell.t == TAG_STRING
        cell = infer_cell("[unquoted, tokens]")
        assert cell.t == TAG_STRING

    def test_array_element_bool_reinference(self):
        # str(False) == "False" -> case-insensitive bool rule
        cell = infer_cell("[True, 'true']")
        # both become booleans under element re-inference
        assert cell.a == "[true,true]"


class TestEnforcedCast:
    def test_long_ok(self):
        assert cast_cell("7", TAG_LONG).l == 7

    def test_long_reject(self):
        with pytest.raises(SchemaError):
            cast_cell("str", TAG_LONG)
        with pytest.raises(SchemaError):
            cast_cell("1.5", TAG_LONG)
        with pytest.raises(SchemaError):
            cast_cell(str(2**63), TAG_LONG)  # overflow is a violation here

    def test_double_reject_nonfinite(self):
        with pytest.raises(SchemaError):
            cast_cell("nan", TAG_DOUBLE)
        with pytest.raises(SchemaError):
            cast_cell("inf", TAG_DOUBLE)

    def test_bool_strict(self):
        assert cast_cell("True", TAG_BOOL).b is True
        with pytest.raises(SchemaError):
            cast_cell("1", TAG_BOOL)

    def test_string_keeps_numeric(self):
        # test_bulk_loader.py:548-575 — "0" under STRING stays a string
        cell = cast_cell("0", TAG_STRING)
        assert cell.t == TAG_STRING
        assert cell.s == "0"

    def test_empty_is_null_for_any_type(self):
        for tag in (TAG_LONG, TAG_DOUBLE, TAG_BOOL, TAG_STRING, TAG_ARRAY):
            assert cast_cell("", tag).t == TAG_NULL

    def test_array_enforced(self):
        assert cast_cell("[1, 2]", TAG_ARRAY).a == "[1,2]"
        with pytest.raises(SchemaError):
            cast_cell("not_an_array", TAG_ARRAY)  # test_bulk_loader.py:775-803


class TestBinaryParity:
    """Byte-level parity with the reference wire encoding, goldens
    constructed independently from the documented format (tag byte +
    payload, entity_file.py:49-176)."""

    def test_long_bytes(self):
        assert encode_cell_binary("5") == struct.pack("=Bq", 4, 5)

    def test_double_bytes(self):
        assert encode_cell_binary("0.2") == struct.pack("=Bd", 2, 0.2)

    def test_bool_bytes(self):
        assert encode_cell_binary("true") == struct.pack("=B?", 1, True)

    def test_string_bytes(self):
        assert encode_cell_binary("ab") == struct.pack("=B3s", 3, b"ab")

    def test_null_bytes(self):
        assert encode_cell_binary("") == struct.pack("=B", 0)

    def test_utf8_bytes(self):
        enc = "Straße".encode("utf-8")
        assert encode_cell_binary("Straße") == struct.pack(
            "=B%ds" % (len(enc) + 1), 3, enc
        )

    def test_array_bytes(self):
        expected = (
            struct.pack("=Bq", 5, 2)
            + struct.pack("=Bq", 4, 1)
            + struct.pack("=B3s", 3, b"ab")
        )
        assert encode_cell_binary("[1, 'ab']") == expected

    def test_overflow_encodes_as_double(self):
        val = float(2**63)
        assert encode_cell_binary(str(2**63)) == struct.pack("=Bd", 2, val)


def test_canonical_literal_roundtrip():
    assert canonical_literal(infer_cell("5")) == "5"
    assert canonical_literal(infer_cell("true")) == "true"
    assert canonical_literal(infer_cell("x y")) == '"x y"'
    assert canonical_literal(infer_cell("")) == "null"


class TestWireFormatParity:
    """Byte-level parity with the reference wire format, checked against
    hand-computed struct layouts (pack_header entity_file.py:240-254;
    pack_props entity_file.py:322-331; edge '=QQ' relation_type.py:89-91).
    """

    def test_pack_header_layout(self):
        import struct

        from redisgraph_bulk_loader_spark.kernel.typing_kernel import (
            pack_header,
        )

        got = pack_header("Person", ["name", None, "age"])
        expected = struct.pack(
            "=7sI5s4s", b"Person", 2, b"name", b"age"
        )
        assert got == expected
        # null terminators present between fields
        assert got.count(b"\x00") >= 3

    def test_pack_header_empty_props(self):
        import struct

        from redisgraph_bulk_loader_spark.kernel.typing_kernel import (
            pack_header,
        )

        assert pack_header("X", [None]) == struct.pack("=2sI", b"X", 0)

    def test_pack_node_row_inferred(self):
        import struct

        from redisgraph_bulk_loader_spark.kernel.typing_kernel import (
            TAG_DOUBLE, TAG_LONG, TAG_STRING, pack_node_row,
        )

        got = pack_node_row(["42", "x", "5.5", "skipme"],
                            ["a", "b", "c", None])
        expected = (
            struct.pack("=Bq", TAG_LONG, 42)
            + struct.pack("=B2s", TAG_STRING, b"x")
            + struct.pack("=Bd", TAG_DOUBLE, 5.5)
        )
        assert got == expected

    def test_pack_node_row_enforced(self):
        import struct

        import pytest as _pytest

        from redisgraph_bulk_loader_spark.exceptions import SchemaError
        from redisgraph_bulk_loader_spark.kernel.typing_kernel import (
            TAG_BOOL, TAG_LONG, pack_node_row,
        )

        got = pack_node_row(["7", "true"], ["n", "f"], [TAG_LONG, TAG_BOOL])
        assert got == struct.pack("=Bq", TAG_LONG, 7) + struct.pack(
            "=B?", TAG_BOOL, True)
        with _pytest.raises(SchemaError):
            pack_node_row(["notanint"], ["n"], [TAG_LONG])

    def test_pack_edge_row_qq_prefix(self):
        import struct

        from redisgraph_bulk_loader_spark.kernel.typing_kernel import (
            TAG_STRING, pack_edge_row,
        )

        got = pack_edge_row(3, 9, ["rel", "prop"], [None, "p"])
        assert got[:16] == struct.pack("=QQ", 3, 9)
        assert got[16:] == struct.pack("=B5s", TAG_STRING, b"prop")

    def test_array_row_roundtrip_layout(self):
        import struct

        from redisgraph_bulk_loader_spark.kernel.typing_kernel import (
            TAG_ARRAY, TAG_LONG, pack_node_row,
        )

        got = pack_node_row(["[1,2]"], ["arr"])
        expected = (
            struct.pack("=Bq", TAG_ARRAY, 2)
            + struct.pack("=Bq", TAG_LONG, 1)
            + struct.pack("=Bq", TAG_LONG, 2)
        )
        assert got == expected
