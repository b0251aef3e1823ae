"""Property test: the exact search kernel equals a numpy oracle for
arbitrary vectors, metrics, and score bands (SURVEY §5 model —
the reference fuzzes its engine with random vectors in CI)."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vearch_spark.operators import topk
from vearch_spark.schema import Metric

N, DIM = 200, 8


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(0, 2, size=(N, DIM))
    df = spark.createDataFrame(
        [(int(i), x[i].tolist()) for i in range(N)],
        "vec_id long, embedding array<double>",
    ).cache()
    df.count()
    return df, x


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 2**16),
    metric=st.sampled_from([Metric.L2, Metric.INNER_PRODUCT]),
    limit=st.integers(1, 30),
    offset=st.integers(0, 5),
)
def test_search_matches_numpy(corpus, seed, metric, limit, offset):
    df, x = corpus
    q = np.random.default_rng(seed).normal(0, 2, size=DIM)
    if metric is Metric.L2:
        scores = ((x - q) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(N), scores))  # asc, tie by id
    else:
        scores = x @ q
        order = np.lexsort((np.arange(N), -scores))  # desc, tie by id
    want = [int(i) for i in order[offset : offset + limit]]
    got = [
        r.vec_id
        for r in topk.search(
            df, "embedding", q.tolist(), limit=limit, offset=offset,
            metric=metric, id_col="vec_id",
        ).collect()
    ]
    assert got == want
