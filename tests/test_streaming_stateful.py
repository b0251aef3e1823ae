"""Stateful streaming dedup (applyInPandasWithState): first-seen
emission must hold across micro-batches via the keyed state store."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_streaming_first_seen(spark, tmp_path):
    from vearch_spark.streaming.stateful import streaming_first_seen

    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    # batch 1: a, b (a duplicated in-batch); batch 2: b dup + new c
    pd.DataFrame({"fp": ["a", "a", "b"], "val": [1, 2, 3]}).to_parquet(
        stream_dir / "b1.parquet"
    )
    pd.DataFrame({"fp": ["b", "c"], "val": [4, 5]}).to_parquet(
        stream_dir / "b2.parquet"
    )
    # deterministic batch order: the file source orders by mod time
    import os

    os.utime(stream_dir / "b1.parquet", (1_000_000_000, 1_000_000_000))
    os.utime(stream_dir / "b2.parquet", (1_000_000_100, 1_000_000_100))

    stream = (
        spark.readStream.schema("fp string, val bigint")
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .parquet(str(stream_dir))
    )
    q = (
        streaming_first_seen(stream, "fp")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    rows = spark.sql("select * from dedup_stream").collect()
    got = {r.fp: r.val for r in rows}
    # exactly one row per distinct key, and it is the FIRST occurrence
    assert set(got) == {"a", "b", "c"}
    assert len(rows) == 3
    assert got["a"] == 1  # not the in-batch duplicate
    # b emitted from batch 1 (val 3), not re-emitted for batch 2's dup
    assert got["b"] == 3
    assert got["c"] == 5


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Near-in-time duplicates are dropped; state is evicted once the
    watermark passes a key (bounded-state form for unbounded
    streams)."""
    import datetime as dt

    from vearch_spark.streaming.stateful import (
        streaming_dedup_within_watermark,
    )

    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    pd.DataFrame({"fp": ["a", "a", "b"],
                  "ts": [ts(0), ts(1), ts(0)],
                  "val": [1, 2, 3]}).to_parquet(
        stream_dir / "b1.parquet", coerce_timestamps="us")
    pd.DataFrame({"fp": ["a", "c"],
                  "ts": [ts(2), ts(3)],
                  "val": [4, 5]}).to_parquet(
        stream_dir / "b2.parquet", coerce_timestamps="us")
    import os

    os.utime(stream_dir / "b1.parquet", (1_000_000_000, 1_000_000_000))
    os.utime(stream_dir / "b2.parquet", (1_000_000_100, 1_000_000_100))

    stream = (
        spark.readStream.schema("fp string, ts timestamp, val bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = (
        streaming_dedup_within_watermark(stream, "fp", "ts", "10 minutes")
        .writeStream.format("memory")
        .queryName("wm_dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    rows = spark.sql("select * from wm_dedup_stream").collect()
    got = {r.fp: r.val for r in rows}
    # every duplicate of a (in-batch and cross-batch, all within the
    # horizon) dropped; first occurrences kept
    assert len(rows) == 3
    assert got == {"a": 1, "b": 3, "c": 5}
