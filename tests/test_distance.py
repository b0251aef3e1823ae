import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vearch_spark.functions.distance import (
    array_lit,
    cosine_similarity,
    hamming_distance,
    inner_product,
    l2_distance,
    l2_normalize,
    l2_squared,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [0.0, 0.0, 0.0]), (3, [-1.0, 0.5, 2.0])],
        "id int, v array<float>",
    )


Q = [3.0, 4.0, 0.0]


def test_l2(vec_df):
    rows = {r.id: r for r in vec_df.select("id", l2_squared("v", Q).alias("sq"), l2_distance("v", Q).alias("d")).collect()}
    for i, v in [(1, [1, 2, 3]), (2, [0, 0, 0]), (3, [-1, 0.5, 2])]:
        exp = sum((a - b) ** 2 for a, b in zip(v, Q))
        assert rows[i].sq == pytest.approx(exp, abs=1e-9)
        assert rows[i].d == pytest.approx(math.sqrt(exp), abs=1e-9)


def test_inner_product_and_cosine(vec_df):
    rows = {r.id: r for r in vec_df.select("id", inner_product("v", Q).alias("ip"), cosine_similarity("v", Q).alias("cos")).collect()}
    assert rows[1].ip == pytest.approx(11.0)
    v = np.array([1.0, 2.0, 3.0])
    q = np.array(Q)
    assert rows[1].cos == pytest.approx(float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))))


def test_l2_normalize(vec_df):
    rows = {r.id: r.n for r in vec_df.select("id", l2_normalize("v").alias("n")).collect()}
    assert np.linalg.norm(rows[1]) == pytest.approx(1.0)


def test_hamming(spark):
    df = spark.createDataFrame([(1, [0b1010, 0b1111])], "id int, c array<int>")
    r = df.select(hamming_distance("c", [0b0101, 0b1111]).alias("h")).collect()[0]
    assert r.h == 4


def test_array_lit_type(spark):
    df = spark.range(1).select(array_lit([1, 2]).alias("a"))
    assert df.schema["a"].dataType.simpleString() == "array<double>"


def test_l2_normalize_null_element_yields_null(spark):
    """A vector containing NULL normalizes to NULL in BOTH forms — the
    expression used to coalesce to an all-zero vector (corrupt data
    indistinguishable from a real zero vector) while the fast form
    returned NaNs."""
    from vearch_spark.functions.distance import l2_normalize, l2_normalize_fast

    df = spark.createDataFrame(
        [(1, [1.0, None, 2.0]), (2, None), (3, [3.0, 4.0]), (4, [0.0, 0.0])],
        "id int, v array<double>",
    )
    slow = {r.id: r.out for r in df.select("id", l2_normalize(F.col("v")).alias("out")).collect()}
    fast = {r.id: r.out for r in df.select("id", l2_normalize_fast(F.col("v")).alias("out")).collect()}
    for got in (slow, fast):
        assert got[1] is None and got[2] is None
        assert got[3] == pytest.approx([0.6, 0.8])
        assert got[4] == [0.0, 0.0]  # zero vector stays zero
