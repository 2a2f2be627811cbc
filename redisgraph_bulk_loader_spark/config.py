"""Run configuration mirroring the reference loader's knobs.

Observable semantics studied at
/root/reference/redisgraph_bulk_loader/config.py:1-44 and pinned by
test/test_config.py: defaults (64 MB buffer/token sizes, 1024 max
tokens, comma separator, QUOTE_NONE, no schema enforcement), hard caps
(1 GB query buffer, 512 MB token, 1024*1023 tokens).

In the Spark engine the size knobs translate to write-task sizing
(``write.target-file-size-bytes`` / maxPartitionBytes) rather than
protocol batching, but the validation envelope is preserved so
loader-compat callers get identical errors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


_MB = 1 << 20

MAX_BUFFER_MB = 1024  # 1 GB query-buffer cap
MAX_TOKEN_MB = 512  # 512 MB token cap
MAX_TOKEN_COUNT = 1024 * 1023


@dataclass
class Config:
    # class default is the hard cap, like the reference Config
    # (test_config.py:test_default_values); the CLI passes 1024
    max_token_count: int = 1024 * 1023
    max_buffer_size: int = 64  # MB
    max_token_size: int = 64  # MB
    enforce_schema: bool = False
    id_type: str = "STRING"
    skip_invalid_nodes: bool = False
    skip_invalid_edges: bool = False
    separator: str = ","
    quoting: int = 3  # csv.QUOTE_NONE
    store_node_identifiers: bool = False
    # reference config.py:17 defaults to backslash escapes; the string
    # "none" (the reference CLI's opt-out spelling) disables escaping
    escapechar: Optional[str] = "\\"

    # derived byte sizes
    max_buffer_bytes: int = field(init=False)
    max_token_bytes: int = field(init=False)

    def __post_init__(self):
        if isinstance(self.escapechar, str) and self.escapechar.lower() == "none":
            self.escapechar = None
        if self.max_token_count > MAX_TOKEN_COUNT:
            raise ValueError(
                f"max_token_count must be <= {MAX_TOKEN_COUNT}"
            )
        if self.max_buffer_size > MAX_BUFFER_MB:
            raise ValueError(f"max_buffer_size must be <= {MAX_BUFFER_MB} MB")
        if self.max_token_size > min(MAX_TOKEN_MB, self.max_buffer_size):
            raise ValueError(
                "max_token_size must be <= min(512, max_buffer_size) MB"
            )
        if self.id_type not in ("STRING", "INTEGER"):
            raise ValueError("id_type must be STRING or INTEGER")
        self.max_buffer_bytes = self.max_buffer_size * _MB
        self.max_token_bytes = self.max_token_size * _MB
