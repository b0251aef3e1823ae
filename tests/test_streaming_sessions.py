"""Streaming session windows cross-validated against lag-based batch
sessionization on the driver's events table."""

import shutil

from pyspark.sql import Window, functions as F

from vearch_spark.sources.parquet import with_event_time
from vearch_spark.streaming.sessions import session_stats


def lag_sessions(ev):
    us = F.unix_micros(F.col("ts_utc"))
    w = Window.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    df = ev.withColumn("_sess", F.sum(is_new).over(w)).withColumn("_us", us)
    return df.groupBy("user_id", "_sess").agg(F.count("*").alias("n_events"))


def summarize(rows):
    out = {}
    for r in rows:
        n, mx = out.get(r.user_id, (0, 0))
        out[r.user_id] = (n + 1, max(mx, r.n_events))
    return out


def test_session_window_batch_matches_lag(spark, sf_dir):
    ev = with_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
    got = summarize(session_stats(ev).collect())
    exp = summarize(lag_sessions(ev).collect())
    assert got == exp and len(got) > 0


def test_session_window_streams(spark, sf_dir, tmp_path):
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream_dir = tmp_path / "ev"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "events.parquet")

    stream = with_event_time(
        spark.readStream.schema(batch.schema).parquet(str(stream_dir))
    ).withWatermark("ts_utc", "1 hour")
    q = (
        session_stats(stream)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = summarize(spark.sql("select * from sess_stream").collect())
    exp = summarize(session_stats(with_event_time(batch)).collect())
    assert got == exp and len(got) > 0
