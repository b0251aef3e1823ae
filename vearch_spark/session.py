"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]``; the configuration below is chosen so
the same logical plans run unchanged on a 1000-executor cluster:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting);
- Arrow on (vectorized Python interop for the few pandas-UDF paths);
- nanosAsLong for the driver's ns-timestamp parquet (Spark's parquet
  reader rejects TIMESTAMP(NANOS) otherwise).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _export_worker_pythonpath() -> str:
    """Put this package's parent dir on the env PYTHONPATH (idempotent).

    The Python-worker factory merges the JVM's ``PYTHONPATH`` into the
    worker interpreter's module path; exporting the repo root before the
    JVM launches makes :mod:`vearch_spark.worker_daemon` importable by
    the daemon process (``spark.python.daemon.module``).
    """
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = os.environ.get("PYTHONPATH", "")
    if root not in parts.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            root + os.pathsep + parts if parts else root
        )
    return os.environ["PYTHONPATH"]


def get_spark(
    app_name: str = "vearch-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    worker_pythonpath = _export_worker_pythonpath()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # local[N] packs all executor threads into one JVM — size the
        # heap for N concurrent task buffers + cached index relations
        # (default 1g OOMs a 1M-row sort+persist). Applied at JVM
        # launch; no-op if a session already exists.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce the output partitioning of CACHED plans too
        # (r9): the persisted index/postings relations (IVF assigned,
        # BM25 postings, banded dedup relations) otherwise freeze the
        # static shuffle.partitions width at materialization, and every
        # downstream stage over the cache schedules that many
        # near-empty tasks (measured: 100+ one-row tasks per stage in
        # bm25/tfidf/hybrid_rrf at sf0.1; back-to-back suite of 14
        # index-backed queries 7.7 s -> 6.1 s with this on). Scale-
        # neutral: it applies the SAME AQE size-based coalescing the
        # engine already relies on for uncached exchanges.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        # daemon shim: backports CPython 3.12's mtime-guarded
        # zipimporter.invalidate_caches (r9, guide §4). Spark calls
        # importlib.invalidate_caches() once per task; on Python 3.11
        # each of the worker's ~13 pyspark.zip zipimporters re-reads
        # the zip central directory every time — ~190 ms of fixed
        # latency on EVERY Python-runner task (a no-op 16-task
        # mapInPandas stage measured 390-590 ms wall at ~3 ms of real
        # compute per task; ~134 ms with the guard). Scale-neutral:
        # any cluster shipping
        # pyspark.zip to Python 3.11 workers pays the same tax.
        .config("spark.python.daemon.module", "vearch_spark.worker_daemon")
        .config("spark.executorEnv.PYTHONPATH", worker_pythonpath)
        # Python workers always run on the executor's host, so the
        # JVM<->worker data channel can ride a unix domain socket
        # instead of loopback TCP (Spark 4.1 feature): interleaved A/B
        # of the no-op 16-task mapInPandas stage reads min 122-151 ms
        # vs 155-175 ms over TCP (3/3 pairs). Host-neutral - same
        # transport choice on any cluster.
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        # keep stderr quiet: the stage progress bar writes \r-frames that
        # can interleave with stdout at the pty level and corrupt the
        # one-line JSON contract bench.py prints for the driver
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the driver's parquet tables from ``sf_dir`` as DataFrames.

    ``events.ts`` arrives as int64 nanoseconds (nanosAsLong); callers use
    :func:`vearch_spark.sources.parquet.read_events` for a typed view.
    """
    from vearch_spark.sources.parquet import TABLES, read_table

    out = {}
    for name in names or TABLES:
        out[name] = read_table(spark, sf_dir, name)
    return out
