"""Bigram-LM perplexity scoring (operators/lm.py) vs an independent
pure-python implementation."""

import math

import pytest

from vearch_spark.operators.lm import BigramLM


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    df.count()
    return df


def _py_nll(texts, lam=0.8):
    uni, bi = {}, {}
    for t in texts.values():
        toks = t.split(" ")
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n, v = sum(uni.values()), len(uni)
    out = {}
    for d, t in texts.items():
        toks = t.split(" ")
        if len(toks) < 2:
            continue
        s = 0.0
        for a, b in zip(toks, toks[1:]):
            p = lam * bi.get((a, b), 0) / uni.get(a, 1) + (1 - lam) * (
                uni.get(b, 0) + 1
            ) / (n + v)
            s += -math.log(p)
        out[d] = s / (len(toks) - 1)
    return out


def test_lm_matches_reference_impl(docs):
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    want = _py_nll(texts)
    lm = BigramLM(text_col="text").fit(docs)
    got = {r.doc_id: r.nll for r in lm.score(docs, id_col="doc_id").collect()}
    lm.unpersist()
    assert set(got) == set(texts)  # one row per input doc, always
    assert {d for d, s in got.items() if s is not None} == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-6)


def test_lm_fluent_scores_below_shuffled(spark, docs):
    """A real doc scores lower nll than the same tokens shuffled —
    the property the quality gate relies on."""
    import numpy as np
    from pyspark.sql import functions as F

    lm = BigramLM(text_col="text").fit(docs)
    rng = np.random.default_rng(0)
    rows = docs.select("doc_id", "text").orderBy("doc_id").limit(20).collect()
    shuffled = []
    for r in rows:
        toks = r.text.split(" ")
        rng.shuffle(toks)
        shuffled.append((r.doc_id, " ".join(toks)))
    sdf = spark.createDataFrame(shuffled, "doc_id long, text string")
    real = {r.doc_id: r.nll for r in lm.score(docs.where(F.col("doc_id") < 20)).collect()}
    shuf = {r.doc_id: r.nll for r in lm.score(sdf).collect()}
    lm.unpersist()
    worse = sum(1 for d in real if shuf[d] > real[d])
    assert worse >= int(0.8 * len(real))


def test_lm_short_docs_score_null(spark, docs):
    lm = BigramLM(text_col="text").fit(docs)
    one = spark.createDataFrame([(1, "single"), (2, "two tokens")],
                                "doc_id long, text string")
    got = {r.doc_id: r.nll for r in lm.score(one).collect()}
    lm.unpersist()
    assert got[1] is None  # no bigrams → explicit NULL row, never dropped
    assert got[2] is not None
