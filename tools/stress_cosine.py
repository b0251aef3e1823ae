"""Scale evidence for the BUCKETED embedding-cosine near-dup path —
the plan that runs at 100 TB (the brute BLAS arm is the documented
small-corpus tool; SCALE.md's cosine posture says "bucketed by IVF
cell at scale", and this harness measures exactly that claim).

Generates N clustered vectors distributedly, plants near-duplicate
pairs (id and id+N/2 are clones with small noise), assigns every row
to an IVF coarse cell (the same KMeans quantizer the ANN indexes use),
and runs operators/dedup.py embedding_cosine_pairs(kernel='blas',
bucket_col=_cluster_id): per-cell normalized BLAS matmul inside
applyInPandas — ONE hash exchange, no pair join. Reports wall time and
planted-pair recall (a planted clone pair is recoverable only when
both copies land in the same coarse cell — the standard SNN/blocking
trade-off the operator documents).

Usage: python tools/stress_cosine.py [N] [ncentroids] [dim]
Defaults 1_000_000 / 1024 / 64. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from tools.stress_1m import make_df
    from vearch_spark.operators.dedup import (
        embedding_cosine_pairs,
        release_skew_guard_caches,
    )
    from vearch_spark.operators.ivf import CLUSTER_COL, IVFFlatIndex
    from vearch_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ncentroids = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    half = n // 2
    spark = get_spark(app_name="cosine-stress")

    base, _ = make_df(spark, half, dim=dim)
    # plant clones: row id+half = row id + tiny noise (cosine ≈ 1),
    # generated executor-side from the id like make_df does
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them and pyspark's hint inference can't resolve pd in this scope
    @pandas_udf("array<double>")
    def _clone(vec, vid):
        out = []
        for v, i in zip(vec, vid):
            rng = np.random.default_rng(int(i) + 777)
            out.append(
                (np.asarray(v, dtype=np.float64) + rng.normal(0, 0.01, dim)).tolist()
            )
        return pd.Series(out)

    clones = base.select(
        (F.col("vec_id") + half).alias("vec_id"),
        _clone(F.col("embedding"), F.col("vec_id")).alias("embedding"),
    )
    df = base.unionByName(clones).persist()
    df.count()

    t0 = time.time()
    idx = IVFFlatIndex("embedding", ncentroids=ncentroids, id_col="vec_id").fit(df)
    assigned = idx.assigned.select("vec_id", "embedding", CLUSTER_COL).persist()
    assigned.count()
    fit_s = round(time.time() - t0, 1)

    t0 = time.time()
    pairs = embedding_cosine_pairs(
        assigned,
        vec_col="embedding",
        id_col="vec_id",
        threshold=0.995,
        bucket_col=CLUSTER_COL,
        max_bucket=100_000,
        kernel="blas",
    ).persist()
    n_pairs = pairs.count()
    pairs_s = round(time.time() - t0, 1)

    # planted recovery DISTRIBUTEDLY (pairs can be millions — never
    # collect them): planted pair (i, i+half) recovered iff present
    expected = spark.range(half).select(
        F.col("id").alias("id_a"), (F.col("id") + half).alias("id_b")
    )
    planted_hit = pairs.join(expected, ["id_a", "id_b"], "semi").count()
    pairs.unpersist()
    # how many planted pairs were recoverable at all (both copies in
    # the same coarse cell) — the blocking bound the operator documents
    same_cell = (
        assigned.select("vec_id", CLUSTER_COL)
        .withColumn("base_id", F.col("vec_id") % half)
        .groupBy("base_id")
        .agg(F.count_distinct(CLUSTER_COL).alias("cells"))
        .where(F.col("cells") == 1)
        .count()
    )
    release_skew_guard_caches()
    out = {
        "n": n,
        "dim": dim,
        "ncentroids": ncentroids,
        "fit_assign_s": fit_s,
        "pairs_s": pairs_s,
        "pairs_found": n_pairs,
        "planted": half,
        "planted_recovered": planted_hit,
        "planted_recoverable_same_cell": same_cell,
        "recall_vs_recoverable": round(planted_hit / max(same_cell, 1), 4),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
