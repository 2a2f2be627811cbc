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
