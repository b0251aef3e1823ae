"""Bigram-LM perplexity scoring (operators/lm.py) vs an independent
pure-python implementation."""

import math

import pytest

from vearch_spark.errors import SearchError
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


def test_lam_bounds_rejected():
    """lam=1 silently drops unseen bigrams from the NLL average
    (log(0) is NULL under ANSI and avg() skips NULLs) — rejected."""
    for bad in (1.0, 1.5, -0.1):
        with pytest.raises(SearchError, match="lam"):
            BigramLM(lam=bad)


def test_fit_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(SearchError, match="empty corpus"):
        BigramLM().fit(empty)
    # all-empty text: no tokens anywhere is equally unfittable
    blank = spark.createDataFrame([(1, None)], "doc_id long, text string")
    with pytest.raises(SearchError, match="empty corpus"):
        BigramLM().fit(blank)


def test_score_tokenizes_once_per_row(spark):
    """The bigram Generate must reference a bound token column, not
    re-evaluate split() per size/slice reference (5x tokenization on
    long docs otherwise). Plan regression on the score path."""
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    lm = BigramLM().fit(docs)
    try:
        plan = lm.score(docs)._jdf.queryExecution().executedPlan().toString()
        gen_lines = [
            ln for ln in plan.splitlines()
            if "Generate" in ln and "arrays_zip" in ln and "InMemory" not in ln
        ]
        assert gen_lines, "bigram Generate node not found"
        for ln in gen_lines:
            assert "split(" not in ln, f"split re-evaluated inside Generate: {ln[:160]}"
    finally:
        lm.unpersist()
