"""Exact search kernel vs a numpy oracle on the driver's embeddings."""

import numpy as np
import pytest

from vearch_spark.errors import SearchError
from pyspark.sql import functions as F

from vearch_spark.operators import topk

Q = [float((i * 7) % 13) / 13.0 for i in range(64)]


def numpy_topk(ids, mat, q, k, metric="L2", flt_mask=None, offset=0):
    q = np.asarray(q, dtype=np.float64)
    if metric == "L2":
        scores = ((mat - q) ** 2).sum(axis=1)
        order_key = scores
    else:
        scores = mat @ q
        order_key = -scores
    idx = np.arange(len(ids))
    if flt_mask is not None:
        idx = idx[flt_mask]
    # total order: score then id (matching the engine's documented tie-break)
    sel = sorted(idx, key=lambda i: (order_key[i], ids[i]))
    sel = sel[offset : offset + k]
    return [(int(ids[i]), float(scores[i])) for i in sel]


def spark_hits(df, **kw):
    out = topk.search(df, vector_col="embedding", query=Q, id_col="vec_id", **kw)
    return [(r.vec_id, r._score) for r in out.collect()]


def test_flat_l2_top10(embeddings, embeddings_np):
    ids, mat, _ = embeddings_np
    exp = numpy_topk(ids, mat, Q, 10, "L2")
    got = spark_hits(embeddings, limit=10, metric="L2")
    assert [g[0] for g in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], abs=1e-9)


def test_flat_ip_top10(embeddings, embeddings_np):
    ids, mat, _ = embeddings_np
    exp = numpy_topk(ids, mat, Q, 10, "IP")
    got = spark_hits(embeddings, limit=10, metric="InnerProduct")
    assert [g[0] for g in got] == [e[0] for e in exp]


def test_l2_sqrt_flag(embeddings, embeddings_np):
    ids, mat, _ = embeddings_np
    got = spark_hits(embeddings, limit=5, metric="L2", l2_sqrt=True)
    exp = numpy_topk(ids, mat, Q, 5, "L2")
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(np.sqrt(e[1]), abs=1e-9)


def test_prefilter(embeddings, embeddings_np):
    ids, mat, labels = embeddings_np
    exp = numpy_topk(ids, mat, Q, 10, "L2", flt_mask=labels < 3)
    got = spark_hits(embeddings, limit=10, metric="L2", flt=F.col("label") < 3)
    assert [g[0] for g in got] == [e[0] for e in exp]


def test_offset(embeddings, embeddings_np):
    ids, mat, _ = embeddings_np
    exp = numpy_topk(ids, mat, Q, 10, "L2", offset=5)
    got = spark_hits(embeddings, limit=10, metric="L2", offset=5)
    assert [g[0] for g in got] == [e[0] for e in exp]


def test_score_band(embeddings, embeddings_np):
    ids, mat, _ = embeddings_np
    all20 = numpy_topk(ids, mat, Q, 20, "L2")
    # midpoints avoid float-boundary ambiguity between numpy's pairwise
    # summation and Spark's sequential fold
    lo = (all20[2][1] + all20[3][1]) / 2
    hi = (all20[15][1] + all20[16][1]) / 2
    got = spark_hits(embeddings, limit=50, metric="L2", min_score=lo, max_score=hi)
    exp = [e for e in all20[3:16]]
    assert [g[0] for g in got] == [e[0] for e in exp]


def test_zero_filter_hits_empty(embeddings):
    # zero filter hits short-circuits to empty (engine.cc:365-372)
    got = spark_hits(embeddings, limit=10, flt=F.col("label") > 999)
    assert got == []


def test_batch_search(spark, embeddings, embeddings_np):
    ids, mat, _ = embeddings_np
    queries = spark.createDataFrame(
        [(0, mat[0].tolist()), (1, mat[17].tolist()), (2, mat[33].tolist())],
        "query_id int, query_vec array<double>",
    )
    out = topk.search_batch(
        embeddings, "embedding", queries, limit=5, metric="L2", id_col="vec_id"
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.vec_id, r._score))
    for qid, src in [(0, 0), (1, 17), (2, 33)]:
        exp = numpy_topk(ids, mat, mat[src], 5, "L2")
        assert [h[0] for h in by_q[qid]] == [e[0] for e in exp]
        assert by_q[qid][0][0] == int(ids[src])  # self is nearest


def test_output_fields_and_vector_value(embeddings):
    out = topk.search(embeddings, "embedding", Q, limit=3, id_col="vec_id")
    # default projection excludes the vector column
    assert "embedding" not in out.columns and "_score" in out.columns
    out2 = topk.search(embeddings, "embedding", Q, limit=3, id_col="vec_id", vector_value=True)
    assert "embedding" in out2.columns


def test_null_score_rows_rank_last_and_meta_excludes_them(spark):
    """A NULL vector scores NULL; it must never outrank a real hit
    (bare .asc() is NULLS FIRST in Spark) and must not inflate
    search_meta's total — unscoreable rows can't be returned."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    hits = topk.search(df, "embedding", [0.0, 0.0], limit=3, id_col="vec_id").collect()
    assert [r.vec_id for r in hits[:2]] == [1, 2]
    assert hits[0]._score is not None
    meta = topk.search_meta(df, "embedding", [0.0, 0.0]).first()
    assert meta.total == 2

    qdf = spark.createDataFrame([(0, [0.0, 0.0])], "query_id int, query_vec array<double>")
    bhits = topk.search_batch(df, "embedding", qdf, limit=2, id_col="vec_id").collect()
    assert [r.vec_id for r in bhits] == [1, 2]


def test_batch_search_validates_limit_and_offset(spark):
    df = spark.createDataFrame([(1, [0.0])], "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame([(0, [0.0])], "query_id int, query_vec array<double>")
    with pytest.raises(SearchError, match="limit"):
        topk.search_batch(df, "embedding", qdf, limit=0, id_col="vec_id")
    with pytest.raises(SearchError, match="offset"):
        topk.search_batch(df, "embedding", qdf, limit=5, offset=-1, id_col="vec_id")


def test_default_projection_hides_system_columns(spark):
    """_seq/_partition_name are engine bookkeeping — the reference's
    default projection is _id + user scalar fields only, and leaking
    them made the schema depend on brute-vs-index dispatch."""
    df = spark.createDataFrame(
        [("a", [0.0], 1, "p0", 7)],
        "_id string, embedding array<double>, _seq long, _partition_name string, color int",
    )
    out = topk.search(df, "embedding", [0.0], limit=1)
    assert out.columns == ["_id", "color", "_score"]
