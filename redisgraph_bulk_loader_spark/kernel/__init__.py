from .typing_kernel import (  # noqa: F401
    TAG_ARRAY,
    TAG_BOOL,
    TAG_DOUBLE,
    TAG_LONG,
    TAG_NULL,
    TAG_STRING,
    TAG_NAMES,
    TypedCell,
    canonical_literal,
    cast_cell,
    encode_cell_binary,
    infer_cell,
    infer_cells,
    cast_cells,
)
from .spark_udfs import (  # noqa: F401
    TYPED_VALUE_SCHEMA,
    infer_col,
    cast_col,
    typed_value_to_sql_expr,
)
