"""Hard-negative mining vs numpy brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vearch_spark.operators.mining import hard_negatives
from vearch_spark.schema import Metric


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(5)
    rows = [
        (i, rng.random(8).tolist(), i % 3)  # 3 labels
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, embedding array<double>, label int"), rows


def test_hard_negatives_match_bruteforce(emb_df):
    df, rows = emb_df
    anchors = df.where(F.col("doc_id") < 5)
    out = hard_negatives(anchors, df, id_col="doc_id", k=4).collect()
    got = {}
    for r in out:
        got.setdefault(r.anchor_id, []).append((r.doc_id, r._score))
    vecs = {i: np.array(v) for i, v, _ in rows}
    labels = {i: l for i, _, l in rows}
    for aid in range(5):
        cand = sorted(
            (float(((vecs[i] - vecs[aid]) ** 2).sum()), i)
            for i in vecs
            if labels[i] != labels[aid]
        )[:4]
        exp = [(i, pytest.approx(d)) for d, i in cand]
        assert [(i, s) for i, s in got[aid]] == exp


def test_hard_negatives_excludes_same_label_and_self(emb_df):
    df, rows = emb_df
    labels = {i: l for i, _, l in rows}
    out = hard_negatives(df.where(F.col("doc_id") == 7), df, id_col="doc_id", k=10)
    for r in out.collect():
        assert r.doc_id != 7
        assert labels[r.doc_id] != labels[7]


def test_hard_negatives_ip_metric_descends(emb_df):
    df, _ = emb_df
    out = hard_negatives(
        df.where(F.col("doc_id") == 0), df, id_col="doc_id", k=5,
        metric=Metric.INNER_PRODUCT,
    ).collect()
    scores = [r._score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_string_metric_accepted(spark):
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0], "a"), (2, [1.0, 0.0], "b"), (3, [2.0, 0.0], "a")],
        "doc_id long, embedding array<double>, label string",
    )
    out = hard_negatives(emb, emb, k=1, metric="InnerProduct").collect()
    assert {r.anchor_id for r in out} == {1, 2, 3}


def test_null_labels_are_their_own_class(spark):
    """NULL-labeled rows must not vanish: NULL is a label class of its
    own (null-safe comparison), so unlabeled rows are negatives for
    every labeled anchor and vice versa."""
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0], "a"), (2, [1.0, 0.0], None), (3, [2.0, 0.0], None)],
        "doc_id long, embedding array<double>, label string",
    )
    out = hard_negatives(emb, emb, k=5).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r.anchor_id, set()).add(r.doc_id)
    # labeled anchor sees both unlabeled rows; unlabeled anchors see
    # only the labeled row (they share the NULL class with each other)
    assert by_anchor[1] == {2, 3}
    assert by_anchor[2] == {1}
    assert by_anchor[3] == {1}


def test_blas_kernel_matches_expr_kernel(emb_df):
    """mapInPandas BLAS kernel == broadcast-join expr kernel: same
    pairs, ranks preserved by the shared window, scores equal at
    float tolerance (BLAS reassociates)."""
    df, _ = emb_df
    anchors = df.where(F.col("doc_id") < 6)
    for metric in (Metric.L2, Metric.INNER_PRODUCT):
        a = [(r.anchor_id, r.doc_id) for r in hard_negatives(
            anchors, df, id_col="doc_id", k=4, metric=metric,
            kernel="expr").collect()]
        b = [(r.anchor_id, r.doc_id) for r in hard_negatives(
            anchors, df, id_col="doc_id", k=4, metric=metric,
            kernel="blas").collect()]
        assert sorted(a) == sorted(b)
    sa = {(r.anchor_id, r.doc_id): r._score for r in hard_negatives(
        anchors, df, id_col="doc_id", k=4, kernel="expr").collect()}
    sb = {(r.anchor_id, r.doc_id): r._score for r in hard_negatives(
        anchors, df, id_col="doc_id", k=4, kernel="blas").collect()}
    for k2, v in sa.items():
        assert sb[k2] == pytest.approx(v, rel=1e-9)


def test_blas_kernel_null_labels(spark):
    """NULL is its own label class in BOTH kernels (eqNullSafe parity):
    unlabeled rows are negatives for labeled anchors and vice versa,
    never dropped, never matched to each other."""
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], None),
        (2, [0.8, 0.2], 0),
        (3, [0.7, 0.3], None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>, label int")
    anchors = df.where(F.col("doc_id").isin(0, 1))
    for kern in ("expr", "blas"):
        got = {}
        for r in hard_negatives(anchors, df, id_col="doc_id", k=4, kernel=kern).collect():
            got.setdefault(r.anchor_id, set()).add(r.doc_id)
        assert got[0] == {1, 3}, kern  # labeled anchor: only NULL rows differ
        assert got[1] == {0, 2}, kern  # NULL anchor: only labeled rows differ


def test_blas_kernel_tie_break_and_empty_anchors(spark):
    """Ties at the per-batch k boundary keep the lowest id (expr
    parity); an empty anchor set returns empty, not an error."""
    rows = [(i, [1.0, 0.0], i % 2) for i in range(10)]  # identical per label
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>, label int")
    anchors = df.where(F.col("doc_id") == 0)
    for kern in ("expr", "blas"):
        got = [r.doc_id for r in hard_negatives(
            anchors, df, id_col="doc_id", k=3, kernel=kern
        ).orderBy("anchor_id", "_score", "doc_id").collect()]
        assert got == [1, 3, 5], kern  # lowest wrong-label ids win ties
    empty = hard_negatives(
        df.where(F.col("doc_id") < 0), df, id_col="doc_id", k=3, kernel="blas"
    )
    assert empty.count() == 0


def test_blas_kernel_anchor_ceiling_guard(spark):
    """The BLAS kernel limit-probes the anchor set BEFORE collecting
    (the embedding_cosine_pairs_blas discipline): a dynamically
    filtered anchor set past the ceiling errors cleanly instead of
    OOMing the driver; the expr kernel still serves the same call."""
    import pytest

    rows = [(i, [float(i), 0.0], i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>, label int")
    with pytest.raises(ValueError, match="exceeds 4 rows"):
        hard_negatives(df, df, id_col="doc_id", k=2, kernel="blas",
                       max_anchor_rows=4)
    ok = hard_negatives(df, df, id_col="doc_id", k=2, kernel="expr",
                        max_anchor_rows=4)
    assert ok.count() == 20  # 10 anchors × k=2, guard is blas-only
