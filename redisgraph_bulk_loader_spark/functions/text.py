"""Text-analysis functions for large-scale training-data pipelines.

Everything is a pure JVM column expression (built-in pyspark.sql
functions only) so filters/projections stay inside whole-stage codegen
and push down to the scan — at 100 TB these run at scan speed with no
Python and no shuffle.

Each function has an exact ANSI-SQL twin in __spark_entry__.oracle_sql
(DuckDB) — the implementations are deliberately expressible in both
engines so the driver's value-hash check can verify them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punct boundaries — a cheap BPE proxy (regex-based)."""
    t = F.regexp_replace(text, r"([0-9])([a-zA-Z])", r"$1 $2")
    t = F.regexp_replace(t, r"([a-zA-Z])([0-9])", r"$1 $2")
    t = F.regexp_replace(t, r"([^\sa-zA-Z0-9])", r" $1 ")
    t = F.trim(t)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


_STOPWORDS = "the,a,an,of,to,and,in,is,for,on,with,that,as,at,by,it"


def quality_score(text: Column) -> Column:
    """Heuristic quality score in [0,1]: blends length saturation,
    alpha ratio, and stopword presence. Deterministic, SQL-twin-able."""
    t = F.trim(text)
    length = F.length(t)
    alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z]", ""))
    alpha_ratio = F.when(length > 0, alpha / length).otherwise(F.lit(0.0))
    length_sat = F.least(length / F.lit(500.0), F.lit(1.0))
    toks = F.split(F.lower(t), r"\s+")
    stop_hits = F.size(
        F.array_intersect(toks, F.split(F.lit(_STOPWORDS), ","))
    )
    stop_ratio = F.least(stop_hits / F.lit(4.0), F.lit(1.0))
    return F.round(
        0.4 * alpha_ratio + 0.3 * length_sat + 0.3 * stop_ratio, 6
    )


def language_id(text: Column) -> Column:
    """Character-class language heuristic: zh for CJK-dominant, ru for
    Cyrillic, el for Greek, else en-ish 'latin'."""
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    cyr = F.length(F.regexp_replace(text, r"[^Ѐ-ӿ]", ""))
    grk = F.length(F.regexp_replace(text, r"[^Ͱ-Ͽ]", ""))
    n = F.greatest(F.length(text), F.lit(1))
    return (
        F.when(cjk / n > 0.2, F.lit("zh"))
        .when(cyr / n > 0.2, F.lit("ru"))
        .when(grk / n > 0.2, F.lit("el"))
        .otherwise(F.lit("latin"))
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint (md5 of normalized
    text) — md5 exists in both Spark and DuckDB so the oracle can
    reproduce it exactly."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


# PII scrubbing — patterns deliberately restricted to syntax with
# identical semantics in Java regex (Spark) and RE2 (DuckDB oracle):
# character classes, greedy quantifiers, non-capturing groups, \b.
# No lookarounds, no backreferences.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\- ]{6,}[0-9]",
}

# Application order is part of the contract: emails first (their
# local/domain digits must not be half-eaten by the phone rule), then
# IPv4 (dotted digit runs), then phones over whatever digits remain.
PII_ORDER = ("email", "ipv4", "phone")


def pii_count(text: Column, kind: str) -> Column:
    """Number of ``kind`` PII matches in ``text`` (long). Note: counts
    are stage-order dependent when composed — redact_pii counts each
    kind on the text AFTER the earlier kinds were replaced."""
    if kind not in PII_PATTERNS:
        raise ValueError(f"unknown PII kind {kind!r}")
    return F.size(
        F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), 0)
    ).cast("long")


def redact_pii(text: Column, kinds=PII_ORDER) -> Column:
    """Replace each PII match with an uppercase ``<KIND>`` token,
    applying ``kinds`` sequentially in the given order. Pure codegen
    regexp_replace chain — runs at scan speed, no shuffle, no Python.
    A training corpus is scrubbed with one withColumn."""
    out = text
    for kind in kinds:
        if kind not in PII_PATTERNS:
            raise ValueError(f"unknown PII kind {kind!r}")
        out = F.regexp_replace(
            out, PII_PATTERNS[kind], f"<{kind.upper()}>"
        )
    return out
