"""Structured Streaming windowed aggregation over the events table —
the streaming half of the events_hourly batch query. Streams the
driver's parquet through a file source with an event-time watermark and
checks the result against the batch plan on the same data."""

import time

import pytest
from pyspark.sql import functions as F

from vearch_spark.sources.parquet import with_event_time


def test_windowed_agg_stream_matches_batch(spark, sf_dir, tmp_path):
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = batch.schema

    # the parquet streaming source wants a directory of arriving files
    import shutil

    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "events.parquet")

    stream = spark.readStream.schema(schema).parquet(str(stream_dir))
    stream = (
        with_event_time(stream)
        .select("ts_utc", "event_type", "value")
        .withWatermark("ts_utc", "1 hour")
    )

    agg = (
        stream.groupBy(F.window("ts_utc", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_hourly")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    got = {
        (r.window.start, r.event_type): r.n
        for r in spark.sql("select * from ev_hourly").collect()
    }
    exp = {
        (r.hour, r.event_type): r.n
        for r in (
            with_event_time(batch)
            .select("ts_utc", "event_type")
            .groupBy(F.date_trunc("hour", "ts_utc").alias("hour"), "event_type")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    assert got == exp
    assert len(got) > 0
