from .triples import (  # noqa: F401
    MENTION_SCHEMA,
    extract_mentions,
    extract_mentions_from_text,
    validate_span_sequences,
)
