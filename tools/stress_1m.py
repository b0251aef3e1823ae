"""Scale stress: IVF over 1M synthetic vectors on local[32].

The driver's testdata tops out at sf0.1 (2k embeddings) — too small to
observe pruning economics. This harness generates N clustered vectors
DISTRIBUTEDLY (deterministic per-id, no driver materialization),
builds the IVFFLAT index, and reports build time, exact-scan vs
pruned-probe latency, and tie-aware recall@10 — the numbers behind
SCALE.md's "pruning cuts the scan by nprobe/ncentroids" claim.

Usage: python tools/stress_1m.py [N] [ncentroids] [nprobe] [kind] [dim]
kind ∈ {flat, two_level, scann, ivfpq}; dim defaults to 64 — dim=512
with kind=ivfpq, ncentroids=1024, nprobe=40 mirrors the reference's
published VGG1M configuration (benchs/README.md:108-116).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402  (module-level: pandas_udf type hints)

DIM = 64
N_CLUSTERS = 256  # data-generating mixture components
# override for high-dim runs where the exact ground-truth scans
# dominate wall-clock (512-dim VGG config: ~25 s/query at 1M)
NQ = int(os.environ.get("STRESS_1M_NQ", "20"))


def make_df(spark, n: int, dim: int = DIM):
    """n clustered vectors, generated inside executors (pandas UDF of
    the row id) — the driver never holds the corpus."""
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    centers = np.random.default_rng(1).normal(0.0, 10.0, size=(N_CLUSTERS, dim))

    @pandas_udf("array<float>")
    def gen(ids: pd.Series) -> pd.Series:
        iv = ids.to_numpy()
        rng = np.random.default_rng(7)  # noise decorrelated from id below
        noise = rng.normal(0.0, 1.5, size=(len(iv), dim))
        vecs = centers[iv % N_CLUSTERS] + noise
        return pd.Series(list(vecs.astype(np.float32)))

    return (
        spark.range(n, numPartitions=32)
        .select(F.col("id").alias("vec_id"), gen("id").alias("embedding"))
    ), centers


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ncentroids = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    # "flat" (default) or "two_level": the hierarchical quantizer at the
    # same TOTAL cell count (k1 = k2 = sqrt(ncentroids)), evidencing the
    # >64k-centroid scale path at measurable size
    kind = sys.argv[4] if len(sys.argv) > 4 else "flat"
    dim = int(sys.argv[5]) if len(sys.argv) > 5 else DIM

    from vearch_spark.operators import topk
    from vearch_spark.operators.ivf import IVFFlatIndex, TwoLevelIVFFlatIndex
    from vearch_spark.schema import Metric
    from vearch_spark.session import get_spark

    spark = get_spark(app_name="stress-1m")
    df, centers = make_df(spark, n, dim)
    df = df.persist()
    df.count()

    queries = centers[np.random.default_rng(3).integers(0, N_CLUSTERS, NQ)] + \
        np.random.default_rng(4).normal(0.0, 1.5, size=(NQ, dim))

    if kind == "two_level":
        k_side = max(2, int(round(ncentroids**0.5)))
        index = TwoLevelIVFFlatIndex(
            "embedding", Metric.L2, ncentroids_l1=k_side, ncentroids_l2=k_side,
            nprobe=nprobe, id_col="vec_id", coarse_train_sample=65_536,
        )
    elif kind == "scann":
        from vearch_spark.operators.ivf import ScannIndex

        # SCANN at scale: the anisotropic coordinate-descent encode is
        # the expensive part and runs inside mapInPandas — this point
        # evidences it parallelizes with the data instead of serializing.
        # rerank_k tracks the PROBED set: a fixed 1000 over the SIFT10M
        # config's ~390k probed rows starves the exact reorder (measured
        # recall@10 0.80; 1.6% of probed -> 0.95; 3.2% -> see SCALE.md).
        # The rerank is an exact re-score of rerank_k rows, so the pool
        # costs linearly and tiny next to the screened scan
        probed = max(1, int(n * nprobe / ncentroids))
        index = ScannIndex(
            "embedding", Metric.L2, ncentroids=ncentroids, nprobe=nprobe,
            nsubvector=16, rerank_k=max(1000, int(probed * 0.032)),
            id_col="vec_id", coarse_train_sample=65_536,
        )
    elif kind == "ivfpq":
        from vearch_spark.operators.ivf import IVFPQIndex

        # the reference's published "Vearch" recall config: modified
        # IVFPQ + exact rerank, nbytes=64 → nsubvector=64
        # (benchs/README.md:84-129); rerank pool sized like the SCANN
        # row — a fixed fraction of the probed set
        probed = max(1, int(n * nprobe / ncentroids))
        index = IVFPQIndex(
            "embedding", Metric.L2, ncentroids=ncentroids, nprobe=nprobe,
            nsubvector=64, rerank_k=max(1000, int(probed * 0.032)),
            id_col="vec_id", coarse_train_sample=65_536,
        )
    else:
        index = IVFFlatIndex(
            "embedding", Metric.L2, ncentroids=ncentroids, nprobe=nprobe,
            id_col="vec_id", coarse_train_sample=65_536,
        )
    t0 = time.time()
    index.fit(df)
    t_build = time.time() - t0

    # exact scans (the brute-force baseline) + ground truth
    # (one warm query first: steady-state timing, not cache rebuild)
    topk.search(df, "embedding", queries[0].tolist(), limit=10,
                id_col="vec_id").count()
    exact = []
    t0 = time.time()
    for q in queries:
        rows = topk.search(df, "embedding", q.tolist(), limit=10,
                           id_col="vec_id").collect()
        exact.append([(r.vec_id, r._score) for r in rows])
    t_exact = (time.time() - t0) / NQ

    # pruned probes
    index.search(df, queries[0].tolist(), limit=10).count()  # warm
    hits = []
    t0 = time.time()
    for q in queries:
        rows = index.search(df, q.tolist(), limit=10).collect()
        hits.append([(r.vec_id, r._score) for r in rows])
    t_pruned = (time.time() - t0) / NQ

    # tie-aware recall@10: a hit counts if its score <= the 10th exact
    rec = 0
    for ex, got in zip(exact, hits):
        kth = ex[-1][1]
        rec += sum(1 for _, s in got if s <= kth + 1e-9)
    recall = rec / (10 * NQ)

    # batched ANN: all NQ queries ride ONE docs scan (broadcast probe
    # relation + query_id rank window) — the serving mode where the
    # per-query job floor amortizes away
    t0 = time.time()
    index.search_batch([q.tolist() for q in queries], limit=10).count()
    t_batch = (time.time() - t0) / NQ

    # bulk kNN join: 2048 query rows against the full corpus through
    # the same quantizer (multi-probe × primary-cell equi join) — the
    # kNN-graph/SemDeDup building block at its scale shape; per-left-row
    # candidates ≈ nprobe·n/ncentroids
    from pyspark.sql import functions as F

    from vearch_spark.operators.knn_join import knn_join

    n_left = 2048
    t0 = time.time()
    knn_join(
        df.where(F.col("vec_id") < n_left),
        # corpus side = the index's persisted assignment relation:
        # zero corpus-side Arrow work, already cluster-partitioned
        index.assigned, index.centroids,
        k=10, nprobe=4, right_cluster_col="_cluster_id",
    ).count()
    t_knn_join = time.time() - t0

    # persisted form: partitionBy(_cluster_id) parquet — probes prune
    # DIRECTORIES (PartitionFilters), the layout that holds at 100 TB
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix="stress_idx_")
    t0 = time.time()
    index.save(path)
    t_save = time.time() - t0
    if kind == "scann":
        # Scann's saved form needs its residual LUTs back; the flat and
        # two-level kinds both reload as the base class (the two-level
        # save IS a flat ncentroids=k1*k2 assignment table by contract)
        from vearch_spark.operators.ivf import ScannIndex as _LoadCls
    elif kind == "ivfpq":
        from vearch_spark.operators.ivf import IVFPQIndex as _LoadCls
    else:
        _LoadCls = IVFFlatIndex
    loaded = _LoadCls.load(spark, path)
    loaded.search(df, queries[0].tolist(), limit=10).count()  # warm FS
    t0 = time.time()
    for q in queries:
        loaded.search(df, q.tolist(), limit=10).count()
    t_loaded = (time.time() - t0) / NQ
    shutil.rmtree(path)

    print(json.dumps({
        "n": n, "dim": dim, "ncentroids": ncentroids, "nprobe": nprobe,
        "index_build_s": round(t_build, 2),
        "index_save_s": round(t_save, 2),
        "exact_scan_s_per_query": round(t_exact, 3),
        "pruned_search_s_per_query": round(t_pruned, 3),
        "batched_search_s_per_query": round(t_batch, 3),
        "knn_join_left_rows_per_s": round(n_left / t_knn_join, 1),
        "file_pruned_search_s_per_query": round(t_loaded, 3),
        "speedup_cached": round(t_exact / t_pruned, 1),
        "speedup_file_pruned": round(t_exact / t_loaded, 1),
        "recall_at_10": round(recall, 3),
    }))
    index.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
