"""SQ8 scalar quantization: roundtrip error, codes dtype, search recall."""

import numpy as np
import pytest

from vearch_spark.operators.sq import SQ8Quantizer
from vearch_spark.operators import topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_roundtrip_error_bounded(spark, emb):
    q = SQ8Quantizer("embedding", id_col="vec_id").fit(emb)
    enc = q.encode(emb)
    # codes are smallint in [0, 255]
    dtype = dict(enc.dtypes)["sq8_codes"]
    assert dtype == "array<smallint>"
    import pyspark.sql.functions as F
    bounds = enc.select(
        F.min(F.array_min("sq8_codes")).alias("lo"),
        F.max(F.array_max("sq8_codes")).alias("hi"),
    ).collect()[0]
    assert bounds["lo"] >= 0 and bounds["hi"] <= 255
    # max reconstruction error <= half a quantization step per dim
    dec = enc.withColumn("_d", q.decode_col("sq8_codes"))
    err = dec.select(
        F.max(
            F.array_max(
                F.zip_with("embedding", "_d", lambda a, b: F.abs(a.cast("double") - b))
            )
        ).alias("e")
    ).collect()[0]["e"]
    step = float(np.max(q.vmax - q.vmin)) / 255
    assert err <= step / 2 + 1e-9


def test_sq8_search_matches_exact_topk(spark, emb):
    q = SQ8Quantizer("embedding", id_col="vec_id").fit(emb)
    enc = q.encode(emb)
    query = [float(x) for x in np.random.default_rng(3).random(
        len(emb.select("embedding").first()[0]))]
    exact = [r.vec_id for r in topk.search(
        emb, "embedding", query, limit=10, id_col="vec_id").collect()]
    # quantized-only scan: high overlap
    sq = [r.vec_id for r in q.search(enc, query, limit=10).collect()]
    assert len(set(sq) & set(exact)) >= 8
    # quantize-then-rerank on the float column: exact top-10 recovered
    rr = [r.vec_id for r in q.search(
        enc, query, limit=10, rerank_col="embedding", rerank_k=50).collect()]
    assert rr == exact


def test_null_vector_encodes_to_null(spark):
    """NULL embeddings must encode to NULL codes, not a valid-looking
    vmin-corner vector (greatest/least skip NULLs → code 0)."""
    from pyspark.sql import functions as F

    train = spark.createDataFrame(
        [("t", [0.0, 1.0]), ("u", [2.0, 3.0])], "_id string, embedding array<double>"
    )
    q = SQ8Quantizer("embedding").fit(train)
    df = spark.createDataFrame([("a", None)], "_id string, embedding array<double>")
    assert q.encode(df).select("sq8_codes").first().sq8_codes is None
    dec = df.withColumn("sq8_codes", F.lit(None).cast("array<smallint>"))
    assert dec.select(q.decode_col("sq8_codes").alias("v")).first().v is None
