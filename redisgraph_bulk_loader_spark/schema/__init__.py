from .header import (  # noqa: F401
    HType,
    ColumnPlan,
    convert_schema_type,
    parse_header,
)
