"""Document deduplication family for training-data pipelines.

- exact_dedup: content-hash groupBy (md5 of normalized text), keeps the
  smallest id per group — one shuffle on a 128-bit key, fully
  SQL-expressible (DuckDB oracle twin in __spark_entry__).
- ngram_jaccard_pairs: exact n-gram Jaccard via shingle explode +
  self-equi-join on shingle + pair aggregation — the classic
  inverted-index form; never a cross join. SQL-expressible.
- minhash_lsh_dedup_pairs: MinHash + banding (functions/hashing.py) —
  the 100 TB path: candidate generation shuffles band buckets only,
  then exact-Jaccard verification on candidates.
- simhash_dup_pairs: 64-bit SimHash; near-dups = hamming distance <= k
  among same-band candidates (4-band split of the 64-bit hash, standard
  Charikar trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    band_buckets,
    hamming64,
    jaccard,
    minhash_signature_df,
    simhash_df,
    word_shingles,
)
from ..functions.text import doc_fingerprint


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One survivor (min id) per exact normalized-content group."""
    w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_fp", doc_fingerprint(F.col(text_col)))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_fp")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int = 10000,
) -> DataFrame:
    """Exact Jaccard-similar pairs (id_a < id_b, jaccard_sim) via the
    inverted-index join: |A ∩ B| from the shingle self-join, |A|,|B|
    from per-doc shingle counts. Stopword-grade shingles above
    ``max_shingle_freq`` are dropped BEFORE both the join and the size
    counts (sizes must come from the same filtered shingle set as the
    intersection, or jaccard_sim is underestimated) — at web scale one
    universal shingle would otherwise produce a quadratic reducer; this
    bound is the standard guard."""
    from .skew import ensure_min_parallelism

    sh = ensure_min_parallelism(df).select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("_sh"),
    ).distinct()
    freq = sh.groupBy("_sh").agg(F.count("*").alias("_f"))
    sh_f = sh.join(F.broadcast(freq.filter(F.col("_f") > max_shingle_freq)), "_sh", "left_anti")
    sizes = sh_f.groupBy("_id").agg(F.count("*").alias("_sz"))
    inter = (
        sh_f.alias("a")
        .join(sh_f.alias("b"), "_sh")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("_inter"))
    )
    return (
        inter.join(sizes.select(F.col("_id").alias("id_a"), F.col("_sz").alias("_sza")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("_sz").alias("_szb")), "id_b")
        .withColumn(
            "jaccard_sim",
            F.col("_inter") / (F.col("_sza") + F.col("_szb") - F.col("_inter")),
        )
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.
    Returns (id_a, id_b, jaccard_sim) with id_a < id_b.

    ``portable=True`` uses the md5-prefix seed-mix hash family and
    string band buckets so a DuckDB oracle reproduces the exact
    candidate set (algorithm twin — banding misses included)."""
    rows = num_hashes // bands
    from ..cache import pin
    from .skew import ensure_min_parallelism

    base = pin(ensure_min_parallelism(df).select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), n).alias("_sh"),
    ))
    # Band join carries only (id, band, bucket) — candidate pairs are
    # deduped as bare key pairs BEFORE the shingle arrays rejoin, so the
    # pair-dedup shuffle moves 2 ids per row instead of 2 full shingle
    # sets per band collision.
    sigs = minhash_signature_df(base, ["_id"], "_sh", num_hashes,
                                portable=portable)
    banded = sigs.select(
        "_id",
        F.explode(
            band_buckets(F.col("_sig"), bands, rows, portable=portable)
        ).alias("_bb"),
    ).select("_id", "_bb.band", "_bb.bucket")
    pairs = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.join(base.select(F.col("_id").alias("id_a"),
                               F.col("_sh").alias("_sha")), "id_a")
        .join(base.select(F.col("_id").alias("id_b"),
                          F.col("_sh").alias("_shb")), "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("_sha"), F.col("_shb")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    portable_hash: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: split the 64-bit hash into 4 16-bit
    bands; by pigeonhole any pair within hamming<=3 shares an exact
    band — join per band, verify full hamming distance.
    ``portable_hash`` uses the md5-prefix token hash so a DuckDB twin
    can reproduce the exact pair set (oracle mode)."""
    from .skew import ensure_min_parallelism

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    hashed = simhash_df(
        ensure_min_parallelism(df).select(
            F.col(id_col).alias("_id"), toks.alias("_toks")),
        ["_id"],
        "_toks",
        portable=portable_hash,
    )
    banded = hashed.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("_bb"),
    ).select("_id", "simhash", "_bb.band", "_bb.bucket")
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def _cc_assignments(pairs: DataFrame, id_col: str) -> DataFrame:
    """(id, _rep) for every id appearing in a near-dup pair: connected
    components over collision-free injective longs, representative =
    min id per component. ``pairs`` must already be materialized
    (checkpointed) by the caller — every frame here references it
    several times. The reps join is size-gated on the member count
    (an upper bound on cluster count): at web scale duplicates are
    30-50% of the corpus, so an unconditional broadcast would OOM.

    Size-gated like connected_components itself (r6): at or below
    ``DRIVER_CC_THRESHOLD`` pairs the whole assignment runs as one
    driver union-find over the NATIVE ids (collect + Arrow frame) —
    the distributed path spends ~8 dim-scale shuffle/checkpoint jobs
    (injective-id checkpoint + count + two mapping joins + CC + reps
    join) deciding clusters a few thousand pairs define, and the
    union-by-min union-find returns the identical min-id-per-component
    answer (python `<` on longs/UTF-8 strings orders exactly like
    Spark). Above the gate the distributed path is unchanged."""
    from ..canon import connected_components
    from ..canon.components import (
        DRIVER_CC_THRESHOLD,
        _driver_union_find,
        injective_node_ids,
    )
    from .endpoints import BROADCAST_THRESHOLD_ROWS

    n_pairs = pairs.count()  # pairs checkpointed — near-free
    if n_pairs <= DRIVER_CC_THRESHOLD:
        import pandas as pd

        comp = dict(_driver_union_find(
            (r["id_a"], r["id_b"]) for r in pairs.collect()
        ))
        pdf = pd.DataFrame(
            sorted(comp.items()), columns=[id_col, "_rep"])
        spark = pairs.sparkSession
        id_type = pairs.schema["id_a"].dataType.simpleString()
        if pdf.empty:
            pdf = pdf.astype(object)
        return spark.createDataFrame(
            pdf, schema=f"{id_col} {id_type}, _rep {id_type}")

    members = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    node_map = injective_node_ids(members, id_col)
    n_members = node_map.count()  # pairs checkpointed — near-free
    edges = (
        pairs.join(node_map.select(F.col(id_col).alias("id_a"),
                                   F.col("node").alias("u")), "id_a")
        .join(node_map.select(F.col(id_col).alias("id_b"),
                              F.col("node").alias("v")), "id_b")
        .select("u", "v")
    )
    cc = connected_components(edges)
    with_comp = node_map.join(cc, "node")
    reps = with_comp.groupBy("component").agg(F.min(id_col).alias("_rep"))
    if n_members <= BROADCAST_THRESHOLD_ROWS:
        reps = F.broadcast(reps)
    return with_comp.join(reps, "component").select(id_col, F.col("_rep"))


def dedup_assignments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 10000,
    method: str = "minhash",
    portable: bool = False,
    collapse_exact: bool = True,
) -> DataFrame:
    """Full dedup assignment: near-dup pairs -> connected components ->
    one surviving representative (min id) per cluster; docs in no pair
    survive as themselves. The composition a training-data pipeline
    actually runs (pairs alone under-merge: a~b, b~c must collapse to
    one survivor even when a~c misses the threshold).

    ``collapse_exact`` (default, minhash method only) pre-collapses
    exact-fingerprint groups to one representative (min id) before
    shingling/banding, then fans cluster assignments back out to
    members. Web corpora carry boilerplate pages with k identical
    copies (k in the millions); banding every copy puts the whole
    group in every band bucket — O(k^2 * bands) candidate rows for an
    outcome the fingerprint already decides. Semantics are unchanged:
    fingerprint-equal docs have identical normalized text, hence
    identical shingle sets, identical signatures, and jaccard 1 — the
    un-collapsed path always merges them anyway, and inter-group
    banding is signature-determined so collapsing cannot lose a
    cross-group candidate. (Not applied to method='exact': the
    inverted-index path's max_shingle_freq filter counts per-doc
    shingle frequency, which collapse would alter.)

    ``method='minhash'`` (default, the 100 TB path) generates
    candidates by banding and keeps only exact-Jaccard-verified pairs —
    identical to the exact pair set wherever banding recall is 1 (all
    high-similarity dups). ``method='exact'`` runs the inverted-index
    join: every pair, O(sum freq^2) shuffle — correctness tool, not the
    scale path.

    Returns (id_col, rep_id). CC runs on collision-free injective
    longs assigned over the pair-member vocabulary (bare xxhash64(id)
    has a ~50% birthday collision at ~5e9 distinct ids — squarely
    inside the 100 TB envelope, and one collision welds two clusters);
    the representative is the min *string* id per component, so node
    longs never surface."""
    from ..cache import PinScope

    # The pair join is the expensive plan and three consumers reference
    # it (edges + both member projections): pin it eagerly. Near-dup
    # pairs are O(duplicates), far smaller than the corpus. The eager
    # localCheckpoint cuts lineage, so the shingle-set cache the pair
    # generator pins internally is released right here instead of
    # living for the session (persist hygiene, VERDICT r3 #3).
    member_map = None
    band_input = df
    if method == "minhash" and collapse_exact:
        # Exact-group map shuffles only (fingerprint, id) — text never
        # rides it. Group rep = min id, so min-of-group-reps per
        # component below still equals min over all member ids.
        # Null TEXT is one exact group: the banding path merges
        # null-text docs too (their [null] shingle arrays hash and
        # jaccard-compare identically — pinned by the degenerate-input
        # pytest), so the fingerprint gets a non-hex sentinel instead
        # of null (a null grouping key would silently fall out of the
        # equi-join below). Null IDS map to themselves: a null id can
        # never appear in a pair (id_a < id_b is null-false), so
        # collapsing one under a group rep would invent a merge the
        # un-collapsed path doesn't make.
        # Footprint: the map only needs docs in MULTI-member exact
        # groups (web corpora: the duplicate minority) — singletons
        # are their own reps and need neither a fan-out row nor
        # exclusion from banding. The map is ONE window chain over the
        # (id, fingerprint) projection: group rep = min(id) over fp,
        # multi-member test = min != max (>= 2 distinct non-null ids),
        # then one row per id. r6: this replaces a groupBy + rejoin +
        # groupBy that referenced the fingerprint scan twice (which
        # forced a pin); single-reference needs no pin, one fp shuffle
        # instead of three, and the scan is spread first —
        # ensure_min_parallelism matters here because a 2-split
        # parquet source would run the md5/normalize projection on 2
        # cores (measured 2.6 s vs 0.7 s at sf1.0). The checkpointed
        # member_map remains O(duplicate docs), not O(corpus).
        from .skew import ensure_min_parallelism

        with PinScope():
            fpm = ensure_min_parallelism(df).filter(
                F.col(id_col).isNotNull()
            ).select(
                F.col(id_col),
                F.coalesce(doc_fingerprint(F.col(text_col)),
                           F.lit("\x00null-text")).alias("_xfp"),
            )
            wfp = Window.partitionBy("_xfp")
            member_map = (
                fpm.withColumn("_grep", F.min(id_col).over(wfp))
                .withColumn("_gmax", F.max(id_col).over(wfp))
                .filter(F.col("_grep") != F.col("_gmax"))
                .groupBy(id_col)  # one row per id even under dup-id input
                .agg(F.min("_grep").alias("_grep"))
            ).localCheckpoint(eager=True)
            # Band everything except the non-rep members of multi
            # groups (anti join against the small dup-member set) —
            # df's text column never enters the group map.
            band_input = df.join(
                member_map.filter(F.col(id_col) != F.col("_grep"))
                .select(id_col),
                id_col, "anti",
            )
            pairs_pre = minhash_lsh_dedup_pairs(
                band_input, id_col, text_col, n=n, threshold=threshold,
                portable=portable,
            ).localCheckpoint(eager=True)
    with PinScope():
        if method == "minhash" and member_map is not None:
            pairs = pairs_pre
        elif method == "minhash":
            pairs = minhash_lsh_dedup_pairs(
                band_input, id_col, text_col, n=n, threshold=threshold,
                portable=portable,
            )
        elif method == "exact":
            pairs = ngram_jaccard_pairs(
                df, id_col, text_col,
                n=n, threshold=threshold, max_shingle_freq=max_shingle_freq,
            )
        else:
            raise ValueError("method must be 'minhash' or 'exact'")
        pairs = pairs.localCheckpoint(eager=True)
    assigned = _cc_assignments(pairs, id_col)
    if member_map is not None:
        # Fan cluster assignments back out: dup-group members inherit
        # their group rep's component rep (groups whose rep is in no
        # pair keep the group rep — the min member id, the old path's
        # answer for an all-identical cluster); every other doc maps
        # through itself.
        return (
            df.select(id_col).distinct()
            .join(member_map, id_col, "left")
            .withColumn("_g", F.coalesce(F.col("_grep"), F.col(id_col)))
            .join(assigned.select(F.col(id_col).alias("_g"), "_rep"),
                  "_g", "left")
            .select(
                id_col,
                F.coalesce(F.col("_rep"), F.col("_g")).alias("rep_id"),
            )
        )
    return (
        df.select(id_col).distinct()
        .join(assigned, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_rep"), F.col(id_col)).alias("rep_id"),
        )
    )


def embedding_dedup_assignments(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.9,
    bits: int = 32,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup assignment — the vector twin of the
    text `dedup_assignments` composition: banded hyperplane self-join
    candidates + exact-cosine verification (`ann_self_join_pairs`) ->
    connected components over injective longs -> one surviving
    representative (min id) per cluster; vectors in no pair survive as
    themselves. Returns (id_col, rep_id).

    The pair generator's defaults are algorithm-twinnable (seeded
    planes), so a SQL oracle can reproduce the exact cluster set; at
    n >= ~100k vectors pass bits=64 (see the bucket-sizing note on
    ann_self_join_pairs)."""
    from ..cache import PinScope
    from .similarity import ann_self_join_pairs

    with PinScope():
        pairs = ann_self_join_pairs(
            df, id_col=id_col, vec_col=vec_col, threshold=threshold,
            bits=bits, bands=bands, dim=dim, seed=seed,
        ).select("id_a", "id_b").localCheckpoint(eager=True)
    assigned = _cc_assignments(pairs, id_col)
    return (
        df.select(id_col).distinct()
        .join(assigned, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_rep"), F.col(id_col)).alias("rep_id"),
        )
    )


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    line_sep: str = "\n",
    scope: str = "global",
) -> DataFrame:
    """Line-level deduplication, the boilerplate-removal pass a web
    corpus gets before document-level dedup (shared footers, cookie
    banners, nav menus repeat across millions of pages while the
    documents containing them stay distinct).

    Rule: a line participates if it is non-empty after trim (empty
    lines are document structure and always survive). With
    ``scope='global'`` a participating line is kept iff this
    (document, position) is the line text's FIRST occurrence in the
    whole corpus, ordered by (id, position) — every later copy is
    deleted. ``scope='doc'`` applies the same rule within each
    document only. Returns (id_col, text_col rebuilt with the
    surviving lines, n_lines_removed).

    Shape at 100 TB: the duplicate decision shuffles only
    (md5(line), id, position); winners resolve with one groupBy-min
    (no window, no skew — a boilerplate line shared by 10^8 docs is
    one group row), the removed set is a THREE-key anti-join
    (hash, id, position), so the hot line's occurrences stay spread
    across partitions instead of funneling into one hash bucket, and
    ONLY the removed (id, position) pairs — sparse by construction —
    shuffle back. Document text never rides any exchange: reassembly
    is a row-local split + index-filter + rejoin against the doc's
    own removed-position array.

    ``line_sep`` is a literal separator (regex-escaped for the split,
    used verbatim for the rejoin).

    NOTE (ADVICE r5): duplicate detection here keys on the RAW line
    bytes, while the ``boilerplate_lines`` audit keys on the TRIMMED
    line — indentation/whitespace variants of a footer count as ONE
    audit line but are NOT collapsed by removal. This is deliberate:
    removal is byte-exact (rebuilt text must be a pure deletion of
    whole duplicate lines), the audit is trim-normalized (a curation
    engineer cares about the footer's reach, not its indentation)."""
    import re as _re

    if scope not in ("global", "doc"):
        raise ValueError(f"scope must be 'global' or 'doc', got {scope!r}")
    sep_re = _re.escape(line_sep)
    parts = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_re, -1)).alias(
            "_idx", "_ln"
        ),
    ).filter(F.trim("_ln") != "")
    keyed = parts.select(
        id_col, "_idx", F.md5("_ln").alias("_h")
    )
    group_keys = ["_h"] if scope == "global" else [id_col, "_h"]
    first = keyed.groupBy(*group_keys).agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("_idx").alias("p"))
              ).alias("_w")
    )
    winners = first.select(
        F.col("_h"),
        F.col("_w.i").alias(id_col),
        F.col("_w.p").alias("_idx"),
    )
    removed = (
        keyed.join(winners, ["_h", id_col, "_idx"], "left_anti")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("_idx")).alias("_rm"))
    )
    rebuilt = F.array_join(
        F.filter(
            F.split(F.col(text_col), sep_re, -1),
            lambda x, i: ~F.array_contains(F.col("_rm"), i),
        ),
        line_sep,
    )
    return docs.join(removed, id_col, "left").select(
        F.col(id_col),
        F.when(F.col("_rm").isNull(), F.col(text_col))
        .otherwise(rebuilt)
        .alias(text_col),
        # explicit null branch, not coalesce(size(...), 0): with ANSI
        # off (legacy sizeOfNull) size(NULL) is -1, not NULL
        F.when(F.col("_rm").isNull(), F.lit(0))
        .otherwise(F.size("_rm"))
        .cast("long")
        .alias("n_lines_removed"),
    )


def boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 100,
    min_docs: int = 2,
    line_sep: str = "\n",
) -> DataFrame:
    """Boilerplate discovery — the audit companion to dedup_lines:
    the ``k`` most widespread non-blank lines across the corpus, as
    (line, n_docs, n_occurrences), ordered by document reach. This is
    what a curation engineer looks at BEFORE turning on line dedup
    (is the top line a cookie banner or a legitimate quote?).

    Ties break lexicographically on the line so the result is
    deterministic. Lines below ``min_docs`` distinct documents are
    dropped (a line seen once is content, not boilerplate).

    Shape at 100 TB: one narrow (md5(line), id) projection, a
    two-level count-distinct-style aggregate ((hash, id) then hash —
    skew-free partial aggregation), and a global exact top-k which
    Spark executes as TakeOrdered (per-partition heaps + driver merge
    of k rows, no global sort shuffle). Line text rejoins only for
    the k winners via a broadcast-scale semi-join."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # NOT spread via ensure_min_parallelism: both the counting subtree
    # and the winner-text subtree scan the source, so a round-robin
    # spread shuffles the full text twice — measured 0.93 s -> 1.64 s
    # at sf1.0. The explode work is cheap relative to that.
    sep_re = __import__("re").escape(line_sep)
    lines = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), sep_re, -1)).alias("_ln"),
        )
        .select(id_col, F.trim("_ln").alias("_ln"))
        .filter(F.col("_ln") != "")
        .select(id_col, F.md5("_ln").alias("_h"))
    )
    per_doc = lines.groupBy("_h", id_col).agg(F.count("*").alias("_c"))
    counts = per_doc.groupBy("_h").agg(
        F.count("*").alias("n_docs"),
        F.sum("_c").alias("n_occurrences"),
    ).filter(F.col("n_docs") >= min_docs)
    # rejoin the k winners' text: winners are k rows, so the hash ->
    # text lookup broadcasts; distinct first so one doc's repeats
    # don't fan the join
    top = counts.orderBy(
        F.desc("n_docs"), F.desc("n_occurrences"), "_h"
    ).limit(k)
    texts = (
        docs.select(
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.transform(
                            F.split(F.col(text_col), sep_re, -1),
                            lambda x: F.trim(x),
                        ),
                        lambda x: x != "",
                    )
                )
            ).alias("line")
        )
        .select(F.md5("line").alias("_h"), "line")
        .groupBy("_h")
        .agg(F.min("line").alias("line"))
    )
    return (
        top.join(texts, "_h")
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "line")
        .select("line", "n_docs", "n_occurrences")
    )
