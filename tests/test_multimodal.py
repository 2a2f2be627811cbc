"""Multimodal operator tests: binary payload plumbing, stub decode
determinism, frame sampling shape, payload dedup."""

from pyspark.sql import functions as F

from redisgraph_bulk_loader_spark.operators.multimodal import (
    FEATURE_DIM,
    _decode_image_stub,
    extract_media_features,
    media_dedup_exact,
    sample_frames,
    synthesize_media,
)


def _media(spark):
    refs = spark.createDataFrame(
        [(f"img://ent_{i:05d}/0",) for i in range(20)], "media_ref string"
    )
    return synthesize_media(spark, refs).cache()


class TestMultimodal:
    def test_media_schema_and_determinism(self, spark):
        m1 = {r.media_ref: bytes(r.payload) for r in _media(spark).collect()}
        m2 = {r.media_ref: bytes(r.payload) for r in _media(spark).collect()}
        assert m1 == m2  # payloads stable across runs
        assert len(m1) == 20

    def test_feature_extraction(self, spark):
        media = _media(spark)
        feats = extract_media_features(media).collect()
        assert len(feats) == 20
        for r in feats:
            assert len(r.feature) == FEATURE_DIM
            assert all(0.0 <= x <= 1.0 for x in r.feature)
        # deterministic vs direct stub call
        one = media.filter(F.col("mime").startswith("image/")).limit(1).collect()[0]
        got = [r for r in feats if r.media_ref == one.media_ref][0]
        expected = _decode_image_stub(bytes(one.payload))
        assert [round(x, 6) for x in got.feature] == [
            round(x, 6) for x in expected
        ]

    def test_frame_sampling_only_timed_media(self, spark):
        media = _media(spark)
        frames = sample_frames(media, every_ms=500)
        rows = frames.collect()
        timed = media.filter(F.col("duration_ms").isNotNull()).count()
        refs_with_frames = {r.media_ref for r in rows}
        assert len(refs_with_frames) == timed
        # frame indexes are dense from 0
        by_ref = {}
        for r in rows:
            by_ref.setdefault(r.media_ref, []).append(r.frame_idx)
        for idxs in by_ref.values():
            assert sorted(idxs) == list(range(len(idxs)))

    def test_payload_dedup(self, spark):
        media = _media(spark)
        # duplicate every payload under a new ref that sorts AFTER the
        # original (survivor = smallest media_ref per digest)
        dup = media.withColumn(
            "media_ref", F.concat(F.lit("z-copy-"), "media_ref")
        )
        both = media.unionByName(dup)
        kept = media_dedup_exact(both)
        assert kept.count() == 20  # one survivor per distinct payload
        assert kept.filter(F.col("media_ref").startswith("z-copy-")).count() == 0
