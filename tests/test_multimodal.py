"""Multimodal operator tests: binary payload plumbing, stub decode
determinism, frame sampling shape, payload dedup."""

import pytest
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

    def test_decode_gate(self, spark):
        """decode='auto' falls back to the stub without PIL and
        upgrades to the real aHash decoder with it; 'pil' without the
        dependency is a loud ImportError, never a silent stub. Both
        decoders share FEATURE_SCHEMA, so the gate never changes the
        plan."""
        from redisgraph_bulk_loader_spark.operators.multimodal import (
            _pil_importable,
        )

        media = _media(spark)
        auto = extract_media_features(media, decode="auto")
        stub = extract_media_features(media, decode="stub")
        assert auto.schema == stub.schema
        if _pil_importable():
            import io

            from PIL import Image

            buf = io.BytesIO()
            Image.new("L", (8, 8), color=128).save(buf, format="PNG")
            png = spark.createDataFrame(
                [("m0", "image/png", 8, 8, None, buf.getvalue())],
                "media_ref string, mime string, width int, height int, "
                "duration_ms int, payload binary",
            )
            row = extract_media_features(png, decode="pil").collect()[0]
            # flat gray image -> every aHash cell ~128/255
            assert all(abs(v - 128 / 255) < 0.02 for v in row.feature)
        else:
            with pytest.raises(ImportError, match="Pillow"):
                extract_media_features(media, decode="pil")
            a = {r.media_ref: r.feature for r in auto.collect()}
            s = {r.media_ref: r.feature for r in stub.collect()}
            assert a == s  # auto == stub in this sandbox
        with pytest.raises(ValueError, match="decode"):
            extract_media_features(media, decode="ffmpeg")

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


class TestMediaNearDup:
    def test_frame_jaccard_pairs(self, spark):
        """Hand-built payloads with known frame overlap: sample_frames
        slices 8-byte windows at (i*7) % (len-8); identical payloads
        share every frame (jaccard 1); a payload sharing a prefix but
        differing later has partial overlap; disjoint bytes never
        pair."""
        from redisgraph_bulk_loader_spark.operators.multimodal import (
            media_near_dup_pairs,
            sample_frames,
        )

        base = bytes(range(200))
        variant = bytes(range(100)) + bytes(range(150, 250))
        other = bytes(reversed(range(200)))
        rows = [
            ("m1", "audio/fake", None, None, 5000, base),
            ("m2", "audio/fake", None, None, 5000, base),
            ("m3", "audio/fake", None, None, 5000, variant),
            ("m4", "audio/fake", None, None, 5000, other),
        ]
        media = spark.createDataFrame(
            rows,
            "media_ref string, mime string, width int, height int, "
            "duration_ms int, payload binary",
        )
        pairs = {
            (r.ref_a, r.ref_b): r.jaccard_sim
            for r in media_near_dup_pairs(media, threshold=0.2).collect()
        }
        assert pairs[("m1", "m2")] == 1.0
        assert ("m1", "m4") not in pairs and ("m2", "m4") not in pairs
        # python twin for the partial-overlap value
        def frame_set(b):
            out = set()
            for i in range(min(5000 // 1000, 32)):
                lo = (i * 7) % max(len(b) - 8, 1)
                out.add(b[lo:lo + 8])
            return out

        fa, fc = frame_set(base), frame_set(variant)
        expected = len(fa & fc) / len(fa | fc)
        if expected >= 0.2:
            assert abs(pairs[("m1", "m3")] - expected) < 1e-9
        else:
            assert ("m1", "m3") not in pairs

    def test_hot_frame_cap_bounds_pairs(self, spark):
        """A ubiquitous frame (network-logo bumper) shared by k media
        must not produce k^2/2 join rows: with max_frame_freq below k
        the hot digest is dropped from BOTH the self-join and the size
        counts, so the pair set collapses from C(k,2) to zero while the
        remaining (unique) frames still count toward sizes."""
        from redisgraph_bulk_loader_spark.operators.multimodal import (
            media_near_dup_pairs,
        )

        k = 20
        common = bytes(range(8))
        rows = []
        for i in range(k):
            # dur=2000ms -> frames at payload[0:8] (shared) and
            # payload[7:15] (unique per media via the i-dependent tail)
            payload = common + bytes([i, 255 - i]) * 8
            rows.append((f"m{i:02d}", "video/fake", None, None, 2000, payload))
        media = spark.createDataFrame(
            rows,
            "media_ref string, mime string, width int, height int, "
            "duration_ms int, payload binary",
        )
        # uncapped: the shared frame makes every pair a candidate —
        # C(20,2)=190 pairs at jaccard 1/(2+2-1)
        uncapped = media_near_dup_pairs(media, threshold=0.1).collect()
        assert len(uncapped) == k * (k - 1) // 2
        assert all(abs(r.jaccard_sim - 1 / 3) < 1e-9 for r in uncapped)
        # capped below k: hot digest dropped before join AND sizes —
        # no candidates survive at all
        capped = media_near_dup_pairs(
            media, threshold=0.1, max_frame_freq=k - 1
        ).collect()
        assert capped == []

    def test_payloads_not_in_shuffle(self, spark):
        """The pair plan must shuffle digests, never frame payloads."""
        from redisgraph_bulk_loader_spark.operators.multimodal import (
            media_near_dup_pairs,
            synthesize_media,
        )

        refs = spark.createDataFrame(
            [(f"img://x/{i}",) for i in range(10)], "media_ref string")
        plan = media_near_dup_pairs(synthesize_media(spark, refs)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "frame_payload" not in plan.split("Exchange")[-1]
