"""Deterministic synthetic corpus of interleaved text+media documents.

Shape per BASELINE.json ``input_hint``::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Generation is fully deterministic per doc index (a pure function of
``(seed, doc_idx)`` — no global RNG state), so the corpus is identical
for any partitioning, parallelism level, or rerun. It is generated
*distributed*: ``spark.range(n)`` fans doc indexes across executors and
a ``mapInPandas`` stage renders spans — at 10^12 docs this is an
embarrassingly parallel generate-on-read source with no shuffle.

The corpus plants:
- extractable triples in a fixed sentence grammar (knows / visited-for /
  works at / is located in / mentions)
- alias surface forms (the same canonical entity rendered as several
  surfaces) exercising entity linking
- hub entities appearing in a large fraction of docs (skew path for
  salted joins / two-phase aggregation)
- media spans whose ``media_ref`` encodes an entity (media triples)
- distractor sentences with no extractable content
- strictly increasing ``offset`` per doc (span-sequence invariant)

``synthesize_gold_triples`` regenerates the planted (subj, pred, obj)
set — the "reference-emitted triples" surface that extraction+linking
is graded against at P/R >= 0.95.
"""

from __future__ import annotations

import random
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    ArrayType,
)

SPAN_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("offset", IntegerType(), False),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_SCHEMA, False), False),
    ]
)

GOLD_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("subj", StringType(), False),  # canonical entity id
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),  # canonical id or media_ref
    ]
)

# ---------------------------------------------------------------------------
# Entity universe: canonical ids ent_00000.. with 1-3 surface forms each.
# Entities 0-4 are hubs (picked with heavy skew below).
# ---------------------------------------------------------------------------

_FIRST = ["Ada", "Alan", "Grace", "Edsger", "Barbara", "Donald", "John",
          "Leslie", "Tony", "Robin", "Frances", "Ken", "Dennis", "Bjarne"]
_LAST = ["Lovelace", "Turing", "Hopper", "Dijkstra", "Liskov", "Knuth",
         "Backus", "Lamport", "Hoare", "Milner", "Allen", "Thompson",
         "Ritchie", "Stroustrup"]
_PLACES = ["USA", "Prague", "Japan", "Greece", "Canada", "China",
           "Amsterdam", "Andorra", "Kazakhstan", "Russia", "Germany",
           "Italy", "Thailand", "Brazil", "Kenya", "Norway"]
_PURPOSES = ["business", "pleasure", "both", "research", "transit"]
_DISTRACTORS = [
    "The weather was unremarkable that day.",
    "Nothing of note happened afterwards.",
    "Several unrelated reports were filed.",
    "A committee was formed to study the matter.",
]

N_ENTITIES = 400
N_HUBS = 5


def _canonical_id(i: int) -> str:
    return f"ent_{i:05d}"


def _base_name(i: int) -> str:
    if i < len(_FIRST) * len(_LAST):
        return f"{_FIRST[i % len(_FIRST)]} {_LAST[(i // len(_FIRST)) % len(_LAST)]}"
    return f"Entity {i:05d}"


def _ambiguous_initials() -> set:
    """(initial, last) pairs shared by more than one entity — their
    dotted alias would be ambiguous, so it is never emitted."""
    seen: dict = {}
    for i in range(N_ENTITIES):
        parts = _base_name(i).split(" ")
        if len(parts) == 2:
            key = (parts[0][0], parts[1])
            seen[key] = seen.get(key, 0) + 1
    return {k for k, v in seen.items() if v > 1}


_AMBIG = _ambiguous_initials()


def _surfaces(i: int) -> List[str]:
    """Deterministic surface forms for entity i: canonical name plus
    alias variants (dotted initial when unambiguous, upper-cased,
    place-style aliases)."""
    name = _base_name(i)
    forms = [name]
    parts = name.split(" ")
    if len(parts) == 2:
        if (parts[0][0], parts[1]) not in _AMBIG:
            forms.append(f"{parts[0][0]}. {parts[1]}")  # "A. Lovelace"
        forms.append(name.upper())                       # "ADA LOVELACE"
    if i % 7 == 0:
        forms.append(f"{name} ({_PLACES[i % len(_PLACES)]})")
    return forms


def entity_surface_pairs() -> List[Tuple[str, str]]:
    """(surface_form, canonical_id) for the full alias dictionary.

    Includes: every alias surface of every entity, the canonical id as
    its own surface (so media_ref-decoded mentions resolve), and place
    names mapping to ``place:<name>`` canonicals.
    """
    pairs = []
    for i in range(N_ENTITIES):
        cid = _canonical_id(i)
        pairs.append((cid, cid))
        for s in _surfaces(i):
            pairs.append((s, cid))
    for p in _PLACES:
        pairs.append((p, f"place:{p}"))
    return pairs


def alias_table(spark: SparkSession) -> DataFrame:
    """The broadcast alias dictionary (small dim table). Built from a
    pandas frame so materialization decodes Arrow batches JVM-side — a
    pickled-list createDataFrame would fork python workers on every
    scan of the dim (measured as a per-run fork storm at 32 slots)."""
    pdf = pd.DataFrame(
        entity_surface_pairs(), columns=["surface", "canonical_id"]
    ).astype("string")
    return spark.createDataFrame(pdf)


# ---------------------------------------------------------------------------
# Per-doc payload: pure function of (seed, doc_idx).
# ---------------------------------------------------------------------------

def _pick_entity(rnd: random.Random) -> int:
    # ~20% of picks land on one of the N_HUBS hub entities -> heavy skew.
    if rnd.random() < 0.20:
        return rnd.randrange(N_HUBS)
    return rnd.randrange(N_ENTITIES)


def _surface_of(rnd: random.Random, i: int) -> str:
    forms = _surfaces(i)
    return forms[rnd.randrange(len(forms))]


def doc_payload(seed: int, doc_idx: int):
    """Return (spans, gold_triples) for one document.

    spans: list of (kind, text, media_ref, offset) with strictly
    increasing offsets; gold: list of (subj_cid, pred, obj).
    """
    rnd = random.Random((seed * 0x9E3779B97F4A7C15 + doc_idx) & 0xFFFFFFFFFFFF)
    n_spans = 2 + rnd.randrange(7)
    spans = []
    gold = []
    offset = 0
    for _ in range(n_spans):
        roll = rnd.random()
        if roll < 0.12:
            # media span: media_ref encodes an entity by canonical id
            ent = _pick_entity(rnd)
            ref = f"img://{_canonical_id(ent)}/{rnd.randrange(4)}"
            spans.append(("media", "", ref, offset))
            gold.append((_canonical_id(ent), "has_media", ref))
        elif roll < 0.27:
            spans.append(("text", _DISTRACTORS[rnd.randrange(len(_DISTRACTORS))],
                          "", offset))
        else:
            s = _pick_entity(rnd)
            kind = rnd.random()
            if kind < 0.25:
                o = _pick_entity(rnd)
                text = f"{_surface_of(rnd, s)} knows {_surface_of(rnd, o)}."
                gold.append((_canonical_id(s), "knows", _canonical_id(o)))
            elif kind < 0.45:
                place = _PLACES[rnd.randrange(len(_PLACES))]
                purpose = _PURPOSES[rnd.randrange(len(_PURPOSES))]
                text = f"{_surface_of(rnd, s)} visited {place} for {purpose}."
                gold.append((_canonical_id(s), "visited", f"place:{place}"))
            elif kind < 0.60:
                o = _pick_entity(rnd)
                text = f"{_surface_of(rnd, s)} works at {_surface_of(rnd, o)}."
                gold.append((_canonical_id(s), "works_at", _canonical_id(o)))
            elif kind < 0.72:
                place = _PLACES[rnd.randrange(len(_PLACES))]
                text = f"{_surface_of(rnd, s)} is located in {place}."
                gold.append((_canonical_id(s), "located_in", f"place:{place}"))
            else:
                # hub predicate: "mentions" dominates -> skewed pred agg
                o = _pick_entity(rnd)
                text = f"{_surface_of(rnd, s)} mentions {_surface_of(rnd, o)}."
                gold.append((_canonical_id(s), "mentions", _canonical_id(o)))
            spans.append(("text", text, "", offset))
        offset += 1 + rnd.randrange(3)  # strictly increasing, with gaps
    return spans, gold


def _doc_id(doc_idx: int) -> str:
    return f"doc-{doc_idx:09d}"


# ---------------------------------------------------------------------------
# Distributed generation
# ---------------------------------------------------------------------------

def synthesize_documents(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    base = spark.range(0, n_docs, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_idx in pdf["id"]:
                spans, _ = doc_payload(seed, int(doc_idx))
                rows.append(
                    (
                        _doc_id(int(doc_idx)),
                        [
                            {"kind": k, "text": t, "media_ref": m, "offset": o}
                            for (k, t, m, o) in spans
                        ],
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return base.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


def synthesize_gold_triples(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """The planted triple set (canonical ids) — the parity surface."""
    base = spark.range(0, n_docs, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_idx in pdf["id"]:
                _, gold = doc_payload(seed, int(doc_idx))
                did = _doc_id(int(doc_idx))
                rows.extend((did, s, p, o) for (s, p, o) in gold)
            yield pd.DataFrame(rows, columns=["doc_id", "subj", "pred", "obj"])

    return base.mapInPandas(gen, schema=GOLD_SCHEMA)
