"""Readers for the driver's parquet tables (TESTDATA.md).

All tables load with plain ``spark.read.parquet`` so Catalyst sees a
native FileScan with pushdown + pruning. ``events.ts`` is int64
nanoseconds on disk (Spark's parquet reader has no ns timestamp type);
``read_events`` exposes both the raw ns long and a micro-precision
timestamp column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# lazy RELATION handles per (session, path) — metadata caching only
# (resolved file index + parquet footer schema), never data or results:
# every action still scans the parquet. A fresh spark.read.parquet of
# the same file costs ~55 ms of driver-side re-resolution per call
# (measured sf0.1: fresh 150 ms vs reused-handle 96 ms for a bare
# count), and the bench builds every query fresh twice — the same
# catalog-style reuse a metastore table gives for free.
_RELATION_CACHE: dict[tuple, DataFrame] = {}


def _read_parquet_cached(spark: SparkSession, path: str) -> DataFrame:
    key = (id(spark), path)
    df = _RELATION_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(path)
        _RELATION_CACHE[key] = df
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = _read_parquet_cached(spark, f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = with_event_time(df)
    return df


def with_event_time(events: DataFrame) -> DataFrame:
    """Add ``ts_utc`` (timestamp, µs) next to the raw ns ``ts`` long."""
    dtype = dict(events.dtypes).get("ts")
    if dtype == "bigint":
        # integer division: ts/1000 in double drops below-µs precision at
        # epoch-ns magnitudes (2^53 < 8.5e17) — off-by-1-µs vs the oracle
        events = events.withColumn("ts_utc", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        # watermarks require TIMESTAMP (instant); session tz is pinned to
        # UTC so the cast preserves the wall-clock value the oracle sees
        events = events.withColumn("ts_utc", F.col("ts").cast("timestamp"))
    else:
        events = events.withColumn("ts_utc", F.col("ts"))
    return events


def lineitem_space(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIXTURES.md F5 mapping: ``lineitem`` viewed as a document
    space — ``_id = l_orderkey '-' l_linenumber``, plus a deterministic
    ingest-order ``_seq`` (docid analog, engine.cc:730-752) derived from
    the natural key so both Spark and a SQL oracle can reproduce it."""
    df = _read_parquet_cached(spark, f"{sf_dir}/lineitem.parquet")
    return df.withColumn(
        "_id", F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    ).withColumn("_seq", F.col("l_orderkey") * 8 + F.col("l_linenumber"))
