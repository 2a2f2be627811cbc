"""Property-based tests (hypothesis) for the typing kernel invariants.

These pin the kernel against the reference's *rules* rather than
specific examples: precedence, empty->NULL, strict-cast totality, and
binary-encoding structure (tag byte first; payload shape per tag).
"""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from redisgraph_bulk_loader_spark.exceptions import SchemaError
from redisgraph_bulk_loader_spark.kernel import (
    TAG_ARRAY,
    TAG_BOOL,
    TAG_DOUBLE,
    TAG_LONG,
    TAG_NULL,
    TAG_STRING,
    cast_cell,
    encode_cell_binary,
    infer_cell,
)

_INT64_MIN, _INT64_MAX = -(2**63), 2**63 - 1


@settings(max_examples=300)
@given(st.integers())
def test_every_int_inferred_long_or_double(n):
    cell = infer_cell(str(n))
    if _INT64_MIN <= n <= _INT64_MAX:
        assert cell.t == TAG_LONG and cell.l == n
    else:
        assert cell.t == TAG_DOUBLE and cell.d == float(n)


@settings(max_examples=300)
@given(st.floats(allow_nan=False, allow_infinity=False))
def test_every_finite_float_numeric(x):
    cell = infer_cell(repr(x))
    assert cell.t in (TAG_LONG, TAG_DOUBLE)
    # value preserved (int-looking reprs parse as long)
    got = cell.l if cell.t == TAG_LONG else cell.d
    assert float(got) == x


@settings(max_examples=300)
@given(st.text(max_size=40))
def test_inference_total_and_deterministic(s):
    a, b = infer_cell(s), infer_cell(s)
    assert a == b
    assert a.t in (TAG_NULL, TAG_BOOL, TAG_DOUBLE, TAG_STRING, TAG_LONG,
                   TAG_ARRAY)
    # exactly one payload set unless NULL
    payloads = [a.b, a.d, a.l, a.s, a.a]
    assert sum(p is not None for p in payloads) == (0 if a.t == TAG_NULL else 1)


@settings(max_examples=300)
@given(st.text(max_size=40))
def test_string_cast_passthrough_or_null(s):
    cell = cast_cell(s, TAG_STRING)
    if s.strip() == "":
        assert cell.t == TAG_NULL
    else:
        assert cell.t == TAG_STRING and cell.s == s.strip()


@settings(max_examples=300)
@given(st.text(max_size=30))
def test_long_cast_agrees_with_python_int(s):
    try:
        expected = int(s.strip())
        ok = _INT64_MIN <= expected <= _INT64_MAX and s.strip() != ""
    except ValueError:
        expected, ok = None, False
    if s.strip() == "":
        assert cast_cell(s, TAG_LONG).t == TAG_NULL
    elif ok:
        assert cast_cell(s, TAG_LONG).l == expected
    else:
        try:
            cast_cell(s, TAG_LONG)
            raised = False
        except SchemaError:
            raised = True
        assert raised


@settings(max_examples=300)
@given(st.text(max_size=40))
def test_binary_encoding_tag_structure(s):
    data = encode_cell_binary(s)
    assert len(data) >= 1
    tag = data[0]
    cell = infer_cell(s)
    assert tag == cell.t
    if tag == TAG_LONG:
        assert len(data) == 9
        assert struct.unpack("=q", data[1:])[0] == cell.l
    elif tag == TAG_DOUBLE:
        assert len(data) == 9
    elif tag == TAG_BOOL:
        assert len(data) == 2
    elif tag == TAG_STRING:
        assert data.endswith(b"\x00")
        assert data[1:-1].decode("utf-8") == cell.s
    elif tag == TAG_NULL:
        assert data == b"\x00"
