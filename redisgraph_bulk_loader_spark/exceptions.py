"""Error types mirroring the reference loader's observable failures.

Reference: /root/reference/redisgraph_bulk_loader/exceptions.py:1-11
(CSVError for malformed input rows/headers, SchemaError for
type-enforcement violations).
"""


class CSVError(Exception):
    """Malformed input: bad row arity, bad header shape."""


class SchemaError(Exception):
    """A cell value violates its declared column type, or a header
    declares an unknown type."""
