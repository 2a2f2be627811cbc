"""Batched mention detection / triple extraction over interleaved
text+media document spans.

Generalizes the reference's row->typed-properties encoding stage into
span->candidate-triple extraction (the reference's analogue is the
per-row pack loop at /root/reference/redisgraph_bulk_loader/
label.py:63-111 — one input row in, typed graph elements out; here one
document in, N candidate triples out, so the operator is UDTF-shaped).

Execution shape: ``mapInPandas`` — Arrow batches in, regex extraction
vectorized inside the batch, exploded triple rows out. No shuffle: at
10^12 docs this stage is embarrassingly parallel per input split and
its cost is pure CPU; the plan keeps it fused with the scan.

Span-sequence invariant (BASELINE.json input_hint): spans must arrive
with strictly increasing ``offset`` per doc; ``validate_span_sequences``
checks (kind, text, media_ref, order) integrity JVM-side before any
extraction, and extraction itself processes spans in offset order so
emitted mention order is deterministic.
"""

from __future__ import annotations

import re
from typing import Iterator, List

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MENTION_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("span_offset", IntegerType(), False),
        StructField("subj_surface", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj_surface", StringType(), False),
        StructField("obj_kind", StringType(), False),  # entity|place|media
    ]
)

# Fixed extraction grammar, applied in precedence order. Anchored to
# whole sentences so distractor text yields nothing.
_RULES = [
    (re.compile(r"^(.+?) visited (.+?) for (\w+)\.$"), "visited", "place"),
    (re.compile(r"^(.+?) is located in (.+?)\.$"), "located_in", "place"),
    (re.compile(r"^(.+?) works at (.+?)\.$"), "works_at", "entity"),
    (re.compile(r"^(.+?) knows (.+?)\.$"), "knows", "entity"),
    (re.compile(r"^(.+?) mentions (.+?)\.$"), "mentions", "entity"),
]

_MEDIA_RE = re.compile(r"^img://([^/]+)/\d+$")


def extract_mentions_from_text(text: str) -> List[tuple]:
    """(subj_surface, pred, obj_surface, obj_kind) for one text span.
    Pure Python — shared by the Spark stage and the pytest oracle."""
    for rx, pred, okind in _RULES:
        m = rx.match(text)
        if m:
            return [(m.group(1), pred, m.group(2), okind)]
    return []


def extract_mentions(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> mention rows (MENTION_SCHEMA).

    Media spans emit (entity-decoded-from-ref, has_media, media_ref).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in MENTION_SCHEMA.fields}

            def emit(did, off, s, p, o, k):
                out["doc_id"].append(did)
                out["span_offset"].append(off)
                out["subj_surface"].append(s)
                out["pred"].append(p)
                out["obj_surface"].append(o)
                out["obj_kind"].append(k)

            for did, spans in zip(pdf["doc_id"], pdf["spans"]):
                # Process in offset order regardless of storage order.
                for span in sorted(spans, key=lambda x: x["offset"]):
                    off = int(span["offset"])
                    if span["kind"] == "media":
                        m = _MEDIA_RE.match(span["media_ref"] or "")
                        if m:
                            emit(did, off, m.group(1), "has_media",
                                 span["media_ref"], "media")
                    else:
                        for s, p, o, k in extract_mentions_from_text(
                            span["text"] or ""
                        ):
                            emit(did, off, s, p, o, k)
            yield pd.DataFrame(out)

    return documents.mapInPandas(run, schema=MENTION_SCHEMA)


def validate_span_sequences(documents: DataFrame) -> Column:
    """Boolean column: spans well-formed for the row — offsets strictly
    increasing in storage order, kinds valid, text XOR media_ref
    populated. Pure JVM expression (higher-order functions), no UDF."""
    spans = F.col("spans")
    offs = F.transform(spans, lambda s: s["offset"])
    offsets_ok = (offs == F.array_sort(offs)) & (
        F.size(F.array_distinct(offs)) == F.size(offs)
    )
    kinds_ok = F.forall(
        spans,
        lambda s: ((s["kind"] == "text") & (s["media_ref"] == ""))
        | ((s["kind"] == "media") & (s["text"] == "")),
    )
    return offsets_ok & kinds_ok
