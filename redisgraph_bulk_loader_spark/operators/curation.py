"""Corpus curation: the composed training-data filter chain.

A pretraining-data pipeline rarely runs quality scoring, language ID,
token counting, and deduplication as separate jobs — it runs ONE
curation pass that keeps documents passing every gate. This operator
composes the package's scan-speed text functions (functions/text.py,
all JVM column expressions) with a dedup-survivor join into a single
plan:

    keep doc iff  quality_score >= min_quality
              and language_id in languages
              and min_tokens <= token_count <= max_tokens
              and doc is the dedup representative AMONG gate-passers

Ordering is filter-then-dedup: survivorship is computed over the
documents that already passed the scalar gates. The other order
silently loses content — a near-dup cluster whose min-id
representative fails a gate would drop the whole cluster even when a
gate-passing member exists (code-review r4). Filter-first also shrinks
the dedup input, which is the cheaper order at scale.

Shape at 100 TB: the text functions ride the parquet scan inside
whole-stage codegen (one pass, no shuffle); the only shuffle is the
dedup survivor computation (exact: one hash groupBy; minhash: the
banded-join family), and the survivor check joins on the id column
only — document text never rides that shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import language_id, quality_score, token_count
from .dedup import dedup_assignments, exact_dedup


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_quality: float = 0.5,
    languages: Sequence[str] = ("latin",),
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    dedup: str = "exact",
    dedup_threshold: float = 0.5,
    portable: bool = False,
) -> DataFrame:
    """One-pass curation: returns the surviving documents as
    (id_col, n_tokens, quality, lang_guess).

    ``dedup='exact'`` keeps the min-id survivor per normalized content
    group (one shuffle); ``dedup='minhash'`` keeps near-dup cluster
    representatives via dedup_assignments (the 100 TB fuzzy path);
    ``dedup='none'`` skips the survivor gate. Survivorship runs over
    the gate-passing subset (filter-then-dedup; see module doc)."""
    scored = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        quality_score(F.col(text_col)).alias("quality"),
        language_id(F.col(text_col)).alias("lang_guess"),
    ).filter(
        (F.col("quality") >= min_quality)
        & F.col("lang_guess").isin(*languages)
        & F.col("n_tokens").between(min_tokens, max_tokens)
    )
    if dedup == "none":
        return scored
    passing = docs.join(scored.select(id_col), id_col, "semi")
    if dedup == "exact":
        survivors = exact_dedup(passing, id_col, text_col).select(id_col)
    elif dedup == "minhash":
        assigned = dedup_assignments(
            passing, id_col, text_col, threshold=dedup_threshold,
            method="minhash", portable=portable,
        )
        survivors = assigned.filter(
            F.col(id_col) == F.col("rep_id")).select(id_col)
    else:
        raise ValueError("dedup must be 'exact', 'minhash', or 'none'")
    # id-only semi join: the text never rides the survivor shuffle
    return scored.join(survivors, id_col, "semi")
