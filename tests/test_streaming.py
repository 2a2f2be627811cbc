"""Structured Streaming ingestion test: file-source stream of events ->
foreachBatch micro-batched MERGE into a nodes table (the streaming
analogue of the reference's size-bounded update batches,
/root/reference/redisgraph_bulk_loader/bulk_update.py:106-122).
"""

import json
import os

from pyspark.sql import functions as F

from redisgraph_bulk_loader_spark.streaming import (
    incremental_graph_update,
    stream_events_to_graph,
)


def test_stream_to_graph_available_now(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # two input files = at least two read units; availableNow drains all
    spark.createDataFrame(
        [(1, "u1", "signup"), (2, "u2", "signup")],
        "event_id long, user string, event_type string",
    ).write.json(os.path.join(src, "batch1"))
    spark.createDataFrame(
        [(3, "u1", "upgrade"), (4, "u3", "signup")],
        "event_id long, user string, event_type string",
    ).write.json(os.path.join(src, "batch2"))

    stream = (
        spark.readStream.schema("event_id long, user string, event_type string")
        .option("maxFilesPerTrigger", 1)
        .json(src + "/*")
    )

    def apply_batch(batch_df, batch_id):
        # MERGE user nodes: last event wins per user
        upd = batch_df.select(
            F.col("user").alias("ext_id"),
            F.col("event_type").alias("last_event"),
            F.col("event_id"),
        )
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            existing = spark.read.parquet(out)
        else:
            existing = spark.createDataFrame(
                [], "ext_id string, last_event string, event_id long"
            )
        merged = incremental_graph_update(
            existing, upd, ["ext_id"], order_col="event_id"
        )
        merged.write.mode("overwrite").parquet(out + ".tmp")
        spark.read.parquet(out + ".tmp").write.mode("overwrite").parquet(out)

    q = stream_events_to_graph(stream, apply_batch, checkpoint_dir=ckpt)
    q.awaitTermination(120)

    final = {r.ext_id: r.last_event for r in spark.read.parquet(out).collect()}
    assert final == {"u1": "upgrade", "u2": "signup", "u3": "signup"}


class TestStatefulSessionize:
    def test_sessions_span_micro_batches(self, spark, tmp_path):
        """A session crossing a micro-batch boundary is counted ONCE
        (state carries last event time); sessions fully inside either
        batch count normally. maxFilesPerTrigger=1 forces two batches
        in file order."""
        import time as _time
        from datetime import datetime, timedelta

        from redisgraph_bulk_loader_spark.streaming.stateful import (
            sessionize_stream,
        )

        base = datetime(2024, 1, 1)

        def ev(uid, minutes):
            return (uid, base + timedelta(minutes=minutes))

        schema = "user_id long, ts timestamp"
        # batch 1: u1 events at 0,10; u2 at 0
        # batch 2: u1 at 20 (same session: gap 10 < 30) and 200 (new);
        #          u2 at 100 (new session)
        src = tmp_path / "stream_src"
        src.mkdir()
        spark.createDataFrame([ev(1, 0), ev(1, 10), ev(2, 0)], schema) \
            .coalesce(1).write.parquet(str(src / "b1"))
        _time.sleep(1.1)  # file-source batch order follows mtime
        spark.createDataFrame([ev(1, 20), ev(1, 200), ev(2, 100)], schema) \
            .coalesce(1).write.parquet(str(src / "b2"))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        out = sessionize_stream(stream, gap_minutes=30)
        q = (
            out.writeStream.format("memory")
            .queryName("sess_out")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM sess_out").collect()
        # latest emission per user = max n_events
        latest = {}
        for r in rows:
            if r.user_id not in latest or r.n_events > latest[r.user_id][1]:
                latest[r.user_id] = (r.n_sessions, r.n_events)
        # u1: sessions at minute 0 (events 0,10,20) and minute 200
        assert latest[1] == (2, 4)
        # u2: sessions at minute 0 and minute 100
        assert latest[2] == (2, 2)
