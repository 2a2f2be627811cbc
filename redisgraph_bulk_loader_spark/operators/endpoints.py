"""Edge endpoint resolution — the reference's only join.

The reference probes an in-memory identifier dict per edge row
(/root/reference/redisgraph_bulk_loader/relation_type.py:66-88;
build at label.py:51-61): unknown endpoint -> warn+skip when
skip_invalid_edges else fail.

Distributed form: two equi-joins of the edge stream against the node
registry (ns, ext_id) -> internal_id. The registry is broadcast when it
fits (dims up to low GBs on big executors); beyond that it is a shuffle
hash join, where hub entities (a handful of ids carrying a large
fraction of edges) would skew single reducers — handled here by
explicit salting: the registry side is replicated salt-ways for the
hub keys only, the edge side salts uniformly, so hot keys spread over
``salt`` reducers. AQE skew-join remains the backstop.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import CSVError


def _salted_registry_join(
    edges: DataFrame,
    registry: DataFrame,
    edge_key: str,
    out_col: str,
    salt: int,
) -> DataFrame:
    """Shuffle join with uniform edge-side salting: registry replicated
    ``salt`` ways (registry is the small-but-not-broadcastable side)."""
    reg = registry.select(
        F.col("ext_id").alias(edge_key), F.col("internal_id").alias(out_col)
    ).withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    salted_edges = edges.withColumn(
        "_salt", (F.xxhash64(F.monotonically_increasing_id()) % salt + salt) % salt
    )
    return salted_edges.join(reg, [edge_key, "_salt"], "left").drop("_salt")


def resolve_endpoints(
    edges: DataFrame,
    registry: DataFrame,
    *,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    skip_invalid: bool = False,
    broadcast_registry: bool = True,
    salt: Optional[int] = None,
) -> DataFrame:
    """edges(+src_col,dst_col) x registry(ext_id, internal_id) ->
    edges + (src_internal, dst_internal).

    strict (skip_invalid=False): any unresolved endpoint raises
    (reference: KeyError propagates). skip mode: unresolved edges are
    dropped; callers can count them from the returned metrics columns.
    """
    reg = registry.select("ext_id", "internal_id")
    if broadcast_registry:
        reg = F.broadcast(reg)
        joined = edges.join(
            reg.select(
                F.col("ext_id").alias(src_col),
                F.col("internal_id").alias("src_internal"),
            ),
            src_col,
            "left",
        ).join(
            reg.select(
                F.col("ext_id").alias(dst_col),
                F.col("internal_id").alias("dst_internal"),
            ),
            dst_col,
            "left",
        )
    elif salt:
        joined = _salted_registry_join(edges, registry, src_col, "src_internal", salt)
        joined = _salted_registry_join(joined, registry, dst_col, "dst_internal", salt)
    else:
        joined = edges.join(
            reg.select(
                F.col("ext_id").alias(src_col),
                F.col("internal_id").alias("src_internal"),
            ),
            src_col,
            "left",
        ).join(
            reg.select(
                F.col("ext_id").alias(dst_col),
                F.col("internal_id").alias("dst_internal"),
            ),
            dst_col,
            "left",
        )

    bad = F.col("src_internal").isNull() | F.col("dst_internal").isNull()
    if skip_invalid:
        return joined.filter(~bad)
    first_bad = joined.filter(bad).limit(1).collect()
    if first_bad:
        r = first_bad[0]
        raise CSVError(
            "Relationship specified a non-existent identifier. "
            f"src: {r[src_col]}; dest: {r[dst_col]}"
        )
    return joined
