"""Bulk kNN-join (operators/knn_join.py): the bucketed all-rows
neighbor join. Semantics are pinned against a numpy twin that applies
the SAME cell pruning (so the comparison is exact, not recall-gated),
plus an exhaustive-probe run that must equal the true exact kNN."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vearch_spark.operators.ivf_oracle import float_centroids
from vearch_spark.operators.knn_join import knn_join, knn_self_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cents():
    return float_centroids(SF)


def _np_knn_join(ids, mat, cents, k, nprobe, exclude_self):
    """Numpy twin: same expanded-L2 probe/assign arithmetic, same
    pruning, exact scoring, ties to lowest neighbor id."""
    c2 = (cents**2).sum(axis=1)
    d = c2 - 2.0 * (mat @ cents.T)
    order = np.argsort(d, axis=1, kind="stable")
    primary = order[:, 0]
    out = {}
    for qi in range(len(ids)):
        cells = set(order[qi, :nprobe].tolist())
        cand = [
            j
            for j in range(len(ids))
            if primary[j] in cells and not (exclude_self and j == qi)
        ]
        sc = ((mat[cand] - mat[qi]) ** 2).sum(axis=1)
        ranked = sorted(zip(sc, ids[cand]))[:k]
        out[int(ids[qi])] = [(int(i), float(s)) for s, i in ranked]
    return out


def test_self_join_matches_numpy_twin(spark, embeddings, embeddings_np, cents):
    ids, mat, _ = embeddings_np
    got = knn_self_join(embeddings, cents, k=5, nprobe=4).collect()
    want = _np_knn_join(ids, mat, cents, k=5, nprobe=4, exclude_self=True)
    by_q = {}
    for r in got:
        by_q.setdefault(r.vec_id, []).append(r)
    assert set(by_q) == set(want)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.neighbor_id for r in rows] == [i for i, _ in want[q]]
        for r, (_, s) in zip(rows, want[q]):
            assert r.score == pytest.approx(s, rel=1e-6)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_exhaustive_probe_is_exact(spark, embeddings, embeddings_np, cents):
    # nprobe == ncentroids ⇒ no pruning ⇒ the true exact kNN join
    ids, mat, _ = embeddings_np
    got = knn_self_join(embeddings, cents, k=3, nprobe=len(cents)).collect()
    d = ((mat[None, :, :] - mat[:, None, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d, np.inf)
    by_q = {}
    for r in got:
        by_q.setdefault(r.vec_id, []).append(r)
    for qi, q in enumerate(ids):
        rows = sorted(by_q[int(q)], key=lambda r: r.rank)
        want = sorted(zip(d[qi], ids))[:3]
        assert [r.neighbor_id for r in rows] == [int(i) for _, i in want]


def test_two_table_join_and_no_self_rows(spark, embeddings, cents):
    left = embeddings.where(F.col("vec_id") < 10)
    out = knn_join(left, embeddings, cents, k=4, nprobe=4).collect()
    qids = {r.vec_id for r in out}
    assert qids == set(range(10))
    # without exclude_self each left row's nearest right row is itself
    # (BLAS expanded form: |q|^2-2qx+|x|^2 leaves ~1e-16 residue at 0)
    for r in out:
        if r.rank == 1:
            assert r.neighbor_id == r.vec_id
            assert r.score == pytest.approx(0.0, abs=1e-9)
    out2 = knn_self_join(embeddings.where(F.col("vec_id") < 10), cents, k=4)
    assert all(r.neighbor_id != r.vec_id for r in out2.collect())


def test_preassigned_right_side_matches_recompute(spark, embeddings, cents):
    """right_cluster_col (the index's persisted assignment) must give
    the exact result of the recompute path — same argmin geometry."""
    from vearch_spark.operators.ivf import CLUSTER_COL
    from vearch_spark.operators.knn_join import probe_cells_udf

    assigned = embeddings.withColumn(
        CLUSTER_COL, F.element_at(probe_cells_udf(cents, 1)(
            F.col("embedding").cast("array<double>")), 1)
    )
    left = embeddings.where(F.col("vec_id") < 50)
    a = knn_join(left, embeddings, cents, k=5, nprobe=4, exclude_self=True)
    b = knn_join(
        left, assigned, cents, k=5, nprobe=4,
        right_cluster_col=CLUSTER_COL, exclude_self=True,
    )
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b


def test_ip_metric_orders_descending(spark, embeddings, cents):
    out = (
        knn_self_join(embeddings.where("vec_id < 50"), cents, k=5, metric="InnerProduct")
        .where("vec_id = 0")
        .orderBy("rank")
        .collect()
    )
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_blas_kernel_matches_expr_kernel(spark, embeddings, cents):
    """The default BLAS cogroup kernel must reproduce the oracle-exact
    expression kernel: same pairs, same ranks, scores equal at float32
    output precision (BLAS reassociates float64 additions)."""
    left = embeddings.where(F.col("vec_id") < 60)
    a = {
        (r.vec_id, r.rank): (r.neighbor_id, r.score)
        for r in knn_join(left, embeddings, cents, k=5, nprobe=4,
                          exclude_self=True, kernel="expr").collect()
    }
    b = {
        (r.vec_id, r.rank): (r.neighbor_id, r.score)
        for r in knn_join(left, embeddings, cents, k=5, nprobe=4,
                          exclude_self=True, kernel="blas").collect()
    }
    assert set(a) == set(b)
    for key, (nbr, s) in a.items():
        assert b[key][0] == nbr
        assert b[key][1] == pytest.approx(s, rel=1e-6)


def test_blas_kernel_ip_and_self_exclusion(spark, embeddings, cents):
    out = (
        knn_self_join(
            embeddings.where("vec_id < 40"), cents, k=4,
            metric="InnerProduct", kernel="blas",
        ).collect()
    )
    assert out and all(r.neighbor_id != r.vec_id for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r.vec_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_unknown_kernel_rejected(spark, embeddings, cents):
    with pytest.raises(ValueError, match="kernel"):
        knn_join(embeddings, embeddings, cents, kernel="gpu")


def test_plan_shape(spark, embeddings, cents):
    """expr kernel: an EQUI join on the cell id — never a nested loop /
    cross product — with the top-k as a WindowGroupLimit rank cut
    applied Partial (map-side) before the exchange. Broadcast-vs-
    shuffle for the equi join is Catalyst's size-based call — the
    operator only fixes the join KEY. blas kernel: no pair join at all
    (FlatMapCoGroupsInPandas per cell), same window cut downstream."""
    plan = (
        knn_self_join(embeddings, cents, k=5, kernel="expr")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan
    joins = [ln for ln in plan.splitlines() if "HashJoin" in ln]
    assert joins, plan

    bplan = (
        knn_self_join(embeddings, cents, k=5, kernel="blas")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapCoGroupsInPandas" in bplan
    assert "Join" not in bplan
    assert "WindowGroupLimit" in bplan


def test_blas_kernel_tie_break_matches_expr(spark, cents):
    """Duplicate embeddings (the SemDeDup case) make score ties routine
    at the per-cell k boundary: the blas kernel must keep the LOWEST
    neighbor id, exactly like the expr kernel's (score, id) window."""
    base = [0.5] * cents.shape[1]
    rows = [(i, base) for i in range(12)]  # 12 identical vectors
    rows += [(100 + i, [v + 0.3 for v in base]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = sorted(
        (r.vec_id, r.rank, r.neighbor_id)
        for r in knn_join(df, df, cents, k=5, nprobe=4,
                          exclude_self=True, kernel="expr").collect()
    )
    b = sorted(
        (r.vec_id, r.rank, r.neighbor_id)
        for r in knn_join(df, df, cents, k=5, nprobe=4,
                          exclude_self=True, kernel="blas").collect()
    )
    assert a == b
    # and the contract itself: for an identical-vector query, the five
    # nearest are the five lowest OTHER ids
    by_q = {}
    for qid, rank, nbr in b:
        by_q.setdefault(qid, []).append(nbr)
    assert by_q[3] == [0, 1, 2, 4, 5]
