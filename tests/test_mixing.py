"""Training-data mixing and decontamination operators
(operators/mixing.py): determinism, exactness of the two-phase top-k
decomposition, and the n-gram contamination rule on planted inputs."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from redisgraph_bulk_loader_spark.operators.mixing import (
    _alnum_ngrams,
    _hash_threshold_hex,
    decontaminate,
    hash_sample,
    stratified_quota_sample,
    token_budget_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"s{i % 3}", " ".join(f"w{(i * 7 + j) % 50}" for j in range(20)))
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).cache()


class TestHashSample:
    def test_threshold_literal(self):
        assert _hash_threshold_hex(0.25) == "4" + "0" * 31
        assert _hash_threshold_hex(0.0) == "0" * 32
        with pytest.raises(ValueError):
            _hash_threshold_hex(1.5)

    def test_deterministic_and_layout_invariant(self, corpus):
        a = hash_sample(corpus, "doc_id", 0.3)
        b = hash_sample(corpus.repartition(13), "doc_id", 0.3)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
        n = a.count()
        assert 0 < n < 300  # nontrivial sample

    def test_salt_draws_independent_samples(self, corpus):
        a = {r.doc_id for r in hash_sample(corpus, "doc_id", 0.3).collect()}
        b = {
            r.doc_id
            for r in hash_sample(corpus, "doc_id", 0.3, salt="v2").collect()
        }
        assert a != b

    def test_monotone_in_fraction(self, corpus):
        small = {
            r.doc_id for r in hash_sample(corpus, "doc_id", 0.1).collect()
        }
        big = {
            r.doc_id for r in hash_sample(corpus, "doc_id", 0.5).collect()
        }
        assert small <= big  # threshold grows, selected set only grows


class TestStratifiedQuota:
    def test_quota_counts(self, corpus):
        out = stratified_quota_sample(corpus, "source", "doc_id", 10)
        counts = dict(
            (r.source, r.n)
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        )
        assert counts == {"s0": 10, "s1": 10, "s2": 10}

    def test_small_stratum_kept_whole(self, spark):
        df = spark.createDataFrame(
            [(1, "tiny"), (2, "tiny"), (3, "big"), (4, "big"), (5, "big")],
            "doc_id long, source string",
        )
        out = stratified_quota_sample(df, "source", "doc_id", 3)
        counts = dict(
            (r.source, r.n)
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        )
        assert counts == {"tiny": 2, "big": 3}

    def test_two_phase_equals_single_window(self, corpus):
        """The salted decomposition must reproduce the definitional
        single-window top-k exactly, for any n_salts."""
        ord_key = F.md5(
            F.concat(
                F.col("source"), F.lit(":"), F.col("doc_id").cast("string")
            )
        )
        w = Window.partitionBy("source").orderBy("_o", "doc_id")
        ref = (
            corpus.withColumn("_o", ord_key)
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= 7)
            .drop("_o", "_rk")
        )
        for n_salts in (1, 4, 64):
            out = stratified_quota_sample(
                corpus, "source", "doc_id", 7, n_salts=n_salts
            )
            assert out.exceptAll(ref).count() == 0
            assert ref.exceptAll(out).count() == 0


class TestDecontaminate:
    @pytest.fixture(scope="class")
    def planted(self, spark):
        secret = "alpha bravo charlie delta echo"
        bench = spark.createDataFrame(
            [(100, f"prefix words {secret} suffix words")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                (1, f"leading junk {secret} trailing junk"),  # hit
                (2, f"Alpha, bravo; CHARLIE delta echo!"),  # hit: tokenization
                (3, "totally unrelated content here okay"),  # clean
                (4, "alpha bravo charlie delta"),  # only 4 shared tokens
                (5, "hi"),  # shorter than n
            ],
            "doc_id long, text string",
        )
        return corpus, bench

    def test_flag_mode(self, planted):
        corpus, bench = planted
        out = {
            r.doc_id: (r.contaminated, r.n_hit_ngrams)
            for r in decontaminate(corpus, bench, n=5).collect()
        }
        assert out[1] == (True, 1)
        assert out[2] == (True, 1)  # punctuation/case-insensitive tokens
        assert out[3] == (False, 0)
        assert out[4] == (False, 0)  # 4-token overlap is not a 5-gram
        assert out[5] == (False, 0)

    def test_drop_mode_complements_flag(self, planted):
        corpus, bench = planted
        clean = decontaminate(corpus, bench, n=5, mode="drop")
        assert sorted(r.doc_id for r in clean.collect()) == [3, 4, 5]
        assert clean.columns == corpus.columns  # original shape survives

    def test_no_broadcast_path_same_result(self, planted):
        corpus, bench = planted
        a = decontaminate(corpus, bench, n=5)
        b = decontaminate(corpus, bench, n=5, broadcast_benchmark=False)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_bad_mode_rejected(self, planted):
        corpus, bench = planted
        with pytest.raises(ValueError):
            decontaminate(corpus, bench, mode="nope")

    def test_empty_benchmark_all_clean(self, planted):
        corpus, bench = planted
        out = decontaminate(corpus, bench.filter("doc_id < 0"), n=5)
        assert out.filter("contaminated").count() == 0
        assert out.count() == corpus.count()

    def test_unigram_mode(self, planted):
        """n=1 degenerates to token-set overlap — doc 3 shares zero
        tokens with the benchmark, doc 4 shares four."""
        corpus, bench = planted
        out = {r.doc_id: r.n_hit_ngrams
               for r in decontaminate(corpus, bench, n=1).collect()}
        assert out[3] == 0 and out[4] == 4

    def test_short_doc_ngrams_empty_not_descending(self, spark):
        """Documents shorter than n tokens must yield an empty array —
        the regex form gets this for free (no n-token window matches),
        where the HOF form needed a descending-F.sequence guard."""
        df = spark.createDataFrame([("one two",)], "text string")
        grams = df.select(
            _alnum_ngrams(F.col("text"), 5).alias("g")
        ).head().g
        assert grams == []


class TestNgramRegexProperty:
    """The lookahead-regex n-gram extractor must equal the definitional
    tokenize-then-slide form on arbitrary ASCII text (the regex trick —
    zero-width token-boundary lookahead — is subtle enough to deserve a
    property test; the DuckDB oracle checks it again cross-engine)."""

    @staticmethod
    def _py_ngrams(text: str, n: int) -> list:
        import re

        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        seen, out = set(), []
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i:i + n])
            if g not in seen:
                seen.add(g)
                out.append(g)
        return out

    def test_matches_python_reference(self, spark):
        import string

        from hypothesis import given, settings
        from hypothesis import strategies as st

        alphabet = string.ascii_letters + string.digits + " .,;:!?-_\n\t'\""
        cases = []

        @settings(max_examples=200, deadline=None)
        @given(st.text(alphabet=alphabet, max_size=120),
               st.integers(min_value=1, max_value=6))
        def collect(text, n):
            cases.append((text, n))

        collect()
        # one Spark job for all examples (per-example jobs would be
        # 200 round-trips); order column keeps rows addressable
        df = spark.createDataFrame(
            [(i, t, n) for i, (t, n) in enumerate(cases)],
            "i long, text string, n int",
        )
        got = {}
        for n in sorted({n for _, n in cases}):
            part = df.filter(F.col("n") == n).select(
                "i", _alnum_ngrams(F.col("text"), n).alias("g")
            )
            for r in part.collect():
                got[r.i] = list(r.g)
        for i, (text, n) in enumerate(cases):
            assert got[i] == self._py_ngrams(text, n), (text, n)


class TestTokenBudget:
    def test_budget_respected_and_deterministic(self, corpus):
        docs = corpus.withColumn("w", F.length("text"))
        out = token_budget_sample(docs, "source", "doc_id", "w", 300)
        sums = {r.source: r.s for r in
                out.groupBy("source").agg(F.sum("w").alias("s")).collect()}
        assert sums and all(s <= 300 for s in sums.values())
        again = token_budget_sample(
            docs.repartition(17), "source", "doc_id", "w", 300)
        assert out.exceptAll(again).count() == 0
        assert again.exceptAll(out).count() == 0

    def test_two_phase_equals_single_window(self, corpus):
        """The salted budget decomposition must equal the definitional
        single-window running-sum cut, for any n_salts."""
        docs = corpus.withColumn("w", F.length("text"))
        ord_key = F.md5(F.concat(
            F.col("source"), F.lit(":"), F.col("doc_id").cast("string")))
        w = (Window.partitionBy("source").orderBy("_o", "doc_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        ref = (docs.withColumn("_o", ord_key)
               .withColumn("_cum", F.sum("w").over(w))
               .filter(F.col("_cum") <= 300).drop("_o", "_cum"))
        for n_salts in (1, 4, 64):
            out = token_budget_sample(docs, "source", "doc_id", "w", 300,
                                      n_salts=n_salts)
            assert out.exceptAll(ref).count() == 0
            assert ref.exceptAll(out).count() == 0

    def test_two_phase_exact_with_weights_near_budget(self, spark):
        """ADVICE r5 regression: weights comparable to the budget used
        to expose an inexact phase-1 cut — a bucket's first
        overshooting row was dropped from phase 1, so phase 2's
        cumulative undercounted and kept rows past the first global
        overshoot (n_salts-dependent output). The decomposition must
        equal the single-window reference for weights drawn from
        [1, budget] across several n_salts."""
        import random

        rnd = random.Random(11)
        budget = 10
        rows = [(i, "s", rnd.randint(1, budget)) for i in range(12)] + [
            (100 + i, "t", rnd.randint(1, budget)) for i in range(12)]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, w int")
        ord_key = F.md5(F.concat(
            F.col("source"), F.lit(":"), F.col("doc_id").cast("string")))
        w = (Window.partitionBy("source").orderBy("_o", "doc_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        ref = (df.withColumn("_o", ord_key)
               .withColumn("_cum", F.sum("w").over(w))
               .filter(F.col("_cum") <= budget).drop("_o", "_cum"))
        ref_rows = sorted(r.doc_id for r in ref.collect())
        for n_salts in (1, 2, 4, 8):
            out = token_budget_sample(df, "source", "doc_id", "w", budget,
                                      n_salts=n_salts)
            assert sorted(r.doc_id for r in out.collect()) == ref_rows, (
                n_salts)

    def test_budget_larger_than_stratum_keeps_all(self, corpus):
        docs = corpus.withColumn("w", F.length("text"))
        out = token_budget_sample(docs, "source", "doc_id", "w", 10**9)
        assert out.count() == docs.count()

    def test_first_overshooting_row_dropped(self, spark):
        """One stratum, every row weight 10, budget 25: exactly the 2
        first-by-hash rows survive (the third would overshoot)."""
        df = spark.createDataFrame(
            [(i, "s", 10) for i in range(6)], "doc_id long, source string, w int")
        out = token_budget_sample(df, "source", "doc_id", "w", 25)
        assert out.count() == 2


class TestPackSequences:
    def test_matches_python_reference(self, corpus):
        """Placement of every document must equal the brute-force
        single-stream layout computed driver-side with hashlib."""
        import hashlib

        from redisgraph_bulk_loader_spark.operators.mixing import (
            pack_sequences,
        )

        docs = corpus.withColumn("w", F.length("text"))
        rows = {r["doc_id"]: r["w"] for r in docs.select("doc_id", "w").collect()}
        order = sorted(
            rows, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )
        window = 128
        expected, off = {}, 0
        for i in order:
            w = rows[i]
            sb, eb = off // window, (off + w - 1) // window
            expected[i] = (off, sb, eb, eb - sb + 1, eb > sb)
            off += w
        out = pack_sequences(docs, "doc_id", "w", window)
        got = {
            r["doc_id"]: (
                r["start_offset"], r["start_bin"], r["end_bin"],
                r["n_bins"], r["spans_boundary"],
            )
            for r in out.collect()
        }
        assert got == expected

    def test_layout_invariant_and_bucket_hex(self, corpus):
        """Same placements regardless of input partitioning and of the
        bucket fan-out (the decomposition is exact for any prefix
        width)."""
        from redisgraph_bulk_loader_spark.operators.mixing import (
            pack_sequences,
        )

        docs = corpus.withColumn("w", F.length("text"))
        base = pack_sequences(docs, "doc_id", "w", 100)
        for variant in (
            pack_sequences(docs.repartition(17), "doc_id", "w", 100),
            pack_sequences(docs, "doc_id", "w", 100, bucket_hex=1),
            pack_sequences(docs, "doc_id", "w", 100, bucket_hex=4),
        ):
            assert base.exceptAll(variant).count() == 0
            assert variant.exceptAll(base).count() == 0

    def test_stream_has_no_gaps_or_overlaps(self, corpus):
        """The packed stream must be a perfect concatenation: offsets
        start at 0, every next start is the previous end, total length
        is the weight sum."""
        from redisgraph_bulk_loader_spark.operators.mixing import (
            pack_sequences,
        )

        docs = corpus.withColumn("w", F.length("text"))
        out = pack_sequences(docs, "doc_id", "w", 512).collect()
        spans = sorted((r["start_offset"], r["weight"]) for r in out)
        assert spans[0][0] == 0
        for (s0, w0), (s1, _) in zip(spans, spans[1:]):
            assert s1 == s0 + w0
        total = sum(w for _, w in spans)
        assert spans[-1][0] + spans[-1][1] == total

    def test_giant_doc_spans_many_windows(self, spark):
        from redisgraph_bulk_loader_spark.operators.mixing import (
            pack_sequences,
        )

        df = spark.createDataFrame(
            [(1, 10), (2, 55), (3, 10)], "doc_id long, w int"
        )
        out = {r["doc_id"]: r for r in
               pack_sequences(df, "doc_id", "w", 10).collect()}
        giant = out[2]
        assert giant["n_bins"] >= 6 and giant["spans_boundary"]
        # every window index between first and last doc is occupied
        assert giant["end_bin"] - giant["start_bin"] + 1 == giant["n_bins"]

    def test_salt_changes_layout_deterministically(self, corpus):
        from redisgraph_bulk_loader_spark.operators.mixing import (
            pack_sequences,
        )

        docs = corpus.withColumn("w", F.length("text"))
        a = pack_sequences(docs, "doc_id", "w", 100, salt="a")
        a2 = pack_sequences(docs, "doc_id", "w", 100, salt="a")
        b = pack_sequences(docs, "doc_id", "w", 100, salt="b")
        assert a.exceptAll(a2).count() == 0
        assert a.exceptAll(b).count() > 0

    def test_rejects_bad_params(self, corpus):
        from redisgraph_bulk_loader_spark.operators.mixing import (
            pack_sequences,
        )

        with pytest.raises(ValueError):
            pack_sequences(corpus, "doc_id", "doc_id", 0)
        with pytest.raises(ValueError):
            pack_sequences(corpus, "doc_id", "doc_id", 10, bucket_hex=0)

    def test_weight_below_one_raises_inline(self, spark):
        """The docstring's weight >= 1 contract is enforced inside the
        projection (resolve_endpoints idiom), not silently violated."""
        from pyspark.errors.exceptions.captured import SparkRuntimeException

        from redisgraph_bulk_loader_spark.operators.mixing import (
            pack_sequences,
        )

        for w in (0, None):
            df = spark.createDataFrame(
                [(1, 5), (2, w)], "doc_id long, w int")
            with pytest.raises(SparkRuntimeException, match="weight >= 1"):
                pack_sequences(df, "doc_id", "w", 10).collect()

    def test_ngram_n_validated_at_plan_build(self, corpus):
        from redisgraph_bulk_loader_spark.operators.mixing import (
            _alnum_ngram_occurrences,
            decontaminate,
        )

        with pytest.raises(ValueError, match="must be >= 1"):
            _alnum_ngram_occurrences(F.col("text"), 0)
        with pytest.raises(ValueError, match="must be >= 1"):
            decontaminate(corpus, corpus.limit(1), n=0)


class TestProportionalSample:
    def test_routes_per_stratum_thresholds(self, corpus):
        from redisgraph_bulk_loader_spark.operators.mixing import (
            hash_sample,
            proportional_sample,
        )

        out = proportional_sample(
            corpus, "source", "doc_id",
            {"s0": 1.0, "s1": 0.3}, default_fraction=0.0)
        got = {s: {r["doc_id"] for r in rows} for s, rows in (
            (s, out.filter(F.col("source") == s).collect())
            for s in ("s0", "s1", "s2"))}
        s0_all = {r["doc_id"] for r in
                  corpus.filter("source = 's0'").collect()}
        s1_sampled = {r["doc_id"] for r in hash_sample(
            corpus.filter("source = 's1'"), "doc_id", 0.3).collect()}
        assert got["s0"] == s0_all          # fraction 1.0 keeps ALL
        assert got["s1"] == s1_sampled      # same rows as hash_sample
        assert got["s2"] == set()           # default 0.0 drops unlisted
        # original column order/names preserved
        assert out.columns == corpus.columns

    def test_fraction_one_keeps_everything(self, corpus):
        """Regression: the arithmetic threshold for 1.0 was the
        33-char '1'+32 zeros, which silently kept only digests
        starting with '0'."""
        from redisgraph_bulk_loader_spark.operators.mixing import (
            _hash_threshold_hex,
            hash_sample,
        )

        assert _hash_threshold_hex(1.0) == "g"
        assert hash_sample(corpus, "doc_id", 1.0).count() == corpus.count()

    def test_bad_fractions_rejected(self, corpus):
        from redisgraph_bulk_loader_spark.operators.mixing import (
            proportional_sample,
        )

        with pytest.raises(ValueError):
            proportional_sample(corpus, "source", "doc_id", {"s0": 1.5})
        with pytest.raises(ValueError):
            proportional_sample(corpus, "source", "doc_id", {},
                                default_fraction=-0.1)
