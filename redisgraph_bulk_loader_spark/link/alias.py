"""Entity linking stage 1: broadcast alias-dictionary join.

Mentions carry raw surface forms; the alias dictionary (a small dim
table — thousands to low millions of rows) maps normalized surfaces to
canonical entity ids. The join is explicitly broadcast: at 10^12 docs
the mention side is enormous and must never shuffle for a dim lookup.

Unresolved surfaces (left-join misses) flow to the MinHash-LSH
candidate blocking stage (lsh.py) — resolution there produces extra
(surface -> canonical) edges that connected-components canonicalization
merges (canon/components.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_surface(col: Column) -> Column:
    """Deterministic surface normalization: trim, collapse whitespace,
    case-fold, strip dots (so "A. Lovelace" ~ "a lovelace"). Pure JVM
    expressions — stays inside whole-stage codegen."""
    c = F.lower(F.trim(col))
    c = F.regexp_replace(c, r"\.", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return c


def _normalize_py(s: str) -> str:
    """Driver-side twin of normalize_surface (python re). Semantics must
    match the JVM version; exotic-locale case-folding differences (e.g.
    Turkish dotted I) would surface as linking misses, not wrong links."""
    import re as _re

    s = s.strip().lower()
    s = s.replace(".", "")
    return _re.sub(r"\s+", " ", s)


def link_mentions(
    mentions: DataFrame,
    aliases: DataFrame,
    *,
    surface_cols=("subj_surface", "obj_surface"),
    collect_dim: bool = True,
) -> DataFrame:
    """Resolve each surface column to ``<col>_cid`` via the broadcast
    alias dict; misses stay null for the LSH stage.

    ``aliases``: (surface, canonical_id). Media objects resolve to
    themselves (the media_ref IS the object id).

    Shape: normalization (regex-heavy, allocation-heavy) runs only on
    the DISTINCT surface vocabulary — at web scale the vocabulary is
    orders of magnitude smaller than the mention stream, and regexing
    every fact row was the measured allocation hot spot. The fact side
    then does plain string-equality broadcast joins (codegen, minimal
    garbage). The distinct is a map-side-combined partial aggregate.
    """
    spark = mentions.sparkSession
    if collect_dim:
        # The alias dictionary is broadcastable by contract; collecting
        # it to the driver to pre-normalize costs the same memory class
        # as broadcasting it, and removes a dropDuplicates shuffle plus
        # one broadcast-exchange build from the critical path.
        seen = {}
        for row in aliases.select("surface", "canonical_id").collect():
            seen.setdefault(_normalize_py(row["surface"]), row["canonical_id"])
        dim = F.broadcast(
            spark.createDataFrame(
                list(seen.items()), schema="_norm string, canonical_id string"
            )
        )
    else:
        dim = F.broadcast(
            aliases.select(
                normalize_surface(F.col("surface")).alias("_norm"),
                F.col("canonical_id"),
            ).dropDuplicates(["_norm"])
        )
    # one scan over the fact table: explode all surface columns into a
    # single vocabulary pass (a union of selects would scan per column)
    vocab = mentions.select(
        F.explode(F.array(*[F.col(c) for c in surface_cols])).alias("_surface")
    )
    resolved = F.broadcast(
        vocab.distinct()
        .withColumn("_norm", normalize_surface(F.col("_surface")))
        .join(dim, "_norm", "left")
        .select("_surface", F.col("canonical_id"))
    )
    out = mentions
    for col in surface_cols:
        cid_col = col.replace("_surface", "_cid")
        out = out.join(
            resolved.select(
                F.col("_surface").alias(col), F.col("canonical_id").alias(cid_col)
            ),
            col,
            "left",
        )
    # media objects: the ref is canonical already
    if "obj_kind" in mentions.columns:
        out = out.withColumn(
            "obj_cid",
            F.when(F.col("obj_kind") == "media", F.col("obj_surface")).otherwise(
                F.col("obj_cid")
            ),
        )
    return out
