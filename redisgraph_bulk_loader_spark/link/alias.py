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


def link_mentions(
    mentions: DataFrame,
    aliases: DataFrame,
    *,
    surface_cols=("subj_surface", "obj_surface"),
) -> DataFrame:
    """Resolve each surface column to ``<col>_cid`` via the broadcast
    alias dict; misses stay null for the LSH stage.

    ``aliases``: (surface, canonical_id). Media objects resolve to
    themselves (the media_ref IS the object id).
    """
    dim = F.broadcast(
        aliases.select(
            normalize_surface(F.col("surface")).alias("_norm"),
            F.col("canonical_id"),
        ).dropDuplicates(["_norm"])
    )
    out = mentions
    for col in surface_cols:
        cid_col = col.replace("_surface", "_cid")
        out = (
            out.withColumn("_norm", normalize_surface(F.col(col)))
            .join(dim, "_norm", "left")
            .withColumnRenamed("canonical_id", cid_col)
            .drop("_norm")
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
