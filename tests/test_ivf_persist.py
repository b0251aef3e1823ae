"""Persisted IVF indexes: the assigned table written partitionBy
(_cluster_id) — probes must prune parquet directories (the 100 TB
behavior), and a reloaded index must answer identically."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from vearch_spark.operators.ivf import IVFFlatIndex, IVFPQIndex
from vearch_spark.schema import Metric

Q = [0.15] * 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivfflat_save_load_roundtrip(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    index = IVFFlatIndex("embedding", Metric.L2, ncentroids=8, nprobe=3, id_col="vec_id")
    index.fit(emb)
    before = [(r.vec_id, r._score) for r in index.search(emb, Q, limit=10).collect()]
    index.save(path)
    index.unpersist()

    # physical form: one parquet directory per cluster
    dirs = sorted(d for d in os.listdir(os.path.join(path, "assigned"))
                  if d.startswith("_cluster_id="))
    assert len(dirs) == 8

    loaded = IVFFlatIndex.load(spark, path)
    assert np.array_equal(loaded.centroids, index.centroids)
    after = [(r.vec_id, r._score) for r in loaded.search(emb, Q, limit=10).collect()]
    assert after == before

    # probes prune FILES: the scan carries a PartitionFilters entry on
    # the cluster column, not a post-scan row filter
    plan = (
        loaded.search(emb, Q, limit=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan
    assert "_cluster_id" in plan.split("PartitionFilters:")[1][:300]


def test_ivfpq_save_load_roundtrip(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    index = IVFPQIndex("embedding", Metric.L2, ncentroids=8, nprobe=4,
                       nsubvector=8, id_col="vec_id")
    index.fit(emb)
    before = [(r.vec_id, r._score) for r in index.search(emb, Q, limit=5).collect()]
    index.save(path)
    index.unpersist()

    loaded = IVFPQIndex.load(spark, path)
    assert np.array_equal(loaded.codebooks, index.codebooks)
    after = [(r.vec_id, r._score) for r in loaded.search(emb, Q, limit=5).collect()]
    assert after == before


def test_ivfrabitq_save_load_roundtrip(spark, emb, tmp_path_factory):
    from vearch_spark.operators.ivf import IVFRaBitQIndex

    path = str(tmp_path_factory.mktemp("rbq") / "idx")
    index = IVFRaBitQIndex("embedding", Metric.L2, ncentroids=8, nprobe=4,
                           rerank_k=64, id_col="vec_id")
    index.fit(emb)
    before = [(r.vec_id, r._score) for r in index.search(emb, Q, limit=5).collect()]
    index.save(path)
    index.unpersist()

    loaded = IVFRaBitQIndex.load(spark, path)
    assert loaded.dim == 64 and loaded.rerank_k == 64
    after = [(r.vec_id, r._score) for r in loaded.search(emb, Q, limit=5).collect()]
    assert after == before
