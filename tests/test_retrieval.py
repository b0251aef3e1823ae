"""BM25 keyword retrieval + RRF hybrid fusion (operators/retrieval.py).

Cross-checked against an independent pure-python BM25 implementation
and hand-computable RRF cases; plan tests pin the scale shape (postings
pruned by query terms before any join)."""

import math

import pytest
from pyspark.sql import functions as F

from vearch_spark.errors import SearchError
from vearch_spark.operators import topk
from vearch_spark.operators.retrieval import BM25Index, build_postings, rrf_fuse


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def bm25(docs):
    idx = BM25Index(text_col="text", id_col="doc_id").fit(docs)
    yield idx
    idx.unpersist()


def _py_bm25(rows, query_terms, k1=1.2, b=0.75):
    """Independent reference implementation over collected rows."""
    toks = {r.doc_id: r.text.split(" ") for r in rows}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for t in set(query_terms):
        df = sum(1 for tk in toks.values() if t in tk)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, tk in toks.items():
            tf = tk.count(t)
            if tf:
                w = idf * tf / (tf + k1 * (1 - b + b * len(tk) / avgdl))
                scores[d] = scores.get(d, 0.0) + w
    return scores


def test_bm25_matches_reference_impl(docs, bm25):
    rows = docs.select("doc_id", "text").collect()
    query = "hash join spark"
    expect = _py_bm25(rows, query.split())
    want = sorted(
        ((round(s, 6), -d) for d, s in expect.items()), reverse=True
    )[:20]
    want = [(-d, s) for s, d in want]
    got = [(r.doc_id, r["_score"]) for r in bm25.search(query, limit=20).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-6)


def test_bm25_unknown_terms_contribute_nothing(docs, bm25):
    a = [(r.doc_id, r["_score"]) for r in bm25.search("hash join", limit=10).collect()]
    b = [(r.doc_id, r["_score"])
         for r in bm25.search("hash join zzzznotaterm", limit=10).collect()]
    assert a == b


def test_bm25_empty_query_rejected(bm25):
    with pytest.raises(SearchError):
        bm25.search("")


def test_bm25_batch_matches_single(docs, bm25):
    queries = ["hash join spark", "window agg", "customer value table"]
    batch = bm25.search_batch(queries, limit=10).collect()
    per = {}
    for r in batch:
        per.setdefault(r.query_id, []).append((r.doc_id, r["_score"]))
    for qid, q in enumerate(queries):
        single = [(r.doc_id, r["_score"]) for r in bm25.search(q, limit=10).collect()]
        assert per[qid] == single


def test_bm25_filter_does_not_reweight_idf(docs, bm25):
    """A result filter restricts candidates but idf stays corpus-wide
    (filtered and unfiltered scores agree on surviving docs)."""
    full = {r.doc_id: r["_score"]
            for r in bm25.search("hash join", limit=500).collect()}
    srcs = bm25.search("hash join", limit=500, flt=F.col("doc_id") % 2 == 0)
    for r in srcs.collect():
        assert r["_score"] == full[r.doc_id]
        assert r.doc_id % 2 == 0


def test_postings_shape(docs):
    p = build_postings(docs)
    row = p.where((F.col("term") == "hash")).orderBy("doc_id").first()
    text = docs.where(F.col("doc_id") == row.doc_id).first().text
    assert row.tf == text.split(" ").count("hash")
    assert row.doc_len == len(text.split(" "))


def test_bm25_plan_prunes_terms_before_join(bm25):
    """The term IN (...) predicate must reach the postings scan before
    the idf join — per-query work stays proportional to the query
    terms' posting lists at any corpus size."""
    plan = bm25.search("hash join", limit=10)._jdf.queryExecution().executedPlan().toString()
    live = plan.split("InMemoryRelation")[0]
    assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan
    # the cached postings scan is term-filtered (batch stats pruning)
    assert "term#" in plan and ("IN" in plan or "isin" in plan.lower())


def test_rrf_hand_case(spark):
    a = spark.createDataFrame([(1, 0.1), (2, 0.2), (3, 0.3)], "doc_id long, _score double")
    b = spark.createDataFrame([(3, 9.0), (1, 5.0)], "doc_id long, _score double")
    # a ascending (L2-style): ranks 1→1, 2→2, 3→3; b descending: 3→1, 1→2
    out = {r.doc_id: r.rrf_score
           for r in rrf_fuse([(a, True), (b, False)], limit=3).collect()}
    assert out[1] == pytest.approx(round(1 / 61 + 1 / 62, 6))
    assert out[2] == pytest.approx(round(1 / 62, 6))
    assert out[3] == pytest.approx(round(1 / 63 + 1 / 61, 6))


def test_hybrid_rrf_end_to_end(spark, docs, bm25, embeddings):
    """Keyword + vector hybrid: BM25 top-20 fused with exact L2 top-20
    over the aligned embeddings (doc_id == vec_id), RRF top-10."""
    q = [float((i * 37) % 101) / 101.0 for i in range(64)]
    vec = topk.search(embeddings, "embedding", q, limit=20, id_col="vec_id").select(
        F.col("vec_id").alias("doc_id"), "_score"
    )
    kw = bm25.search("hash join spark", limit=20)
    fused = rrf_fuse([(kw, False), (vec, True)], limit=10).collect()
    assert len(fused) == 10
    # best fused doc appears in at least one source list
    srcs = {r.doc_id for r in kw.collect()} | {r.doc_id for r in vec.collect()}
    assert fused[0].doc_id in srcs
    assert all(fused[i].rrf_score >= fused[i + 1].rrf_score for i in range(9))


def test_tfidf_keywords_match_reference_impl(docs, bm25):
    """keywords() vs a pure-python tf·ln(N/df) top-k on the same
    corpus (exact scores, same tie-break)."""
    import math

    texts = {r.doc_id: r.text for r in
             docs.where(F.col("doc_id") < 30).select("doc_id", "text").collect()}
    all_texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    n = len(all_texts)
    df_count: dict[str, int] = {}
    tfs: dict[int, dict[str, int]] = {}
    for d, t in all_texts.items():
        tf: dict[str, int] = {}
        for w in t.split(" "):
            if w:
                tf[w] = tf.get(w, 0) + 1
        tfs[d] = tf
        for w in tf:
            df_count[w] = df_count.get(w, 0) + 1
    want = {}
    for d in texts:
        scored = sorted(
            ((round(tf * math.log(n / df_count[w]), 6), w) for w, tf in tfs[d].items()),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        want[d] = [(w, s) for s, w in scored]
    got: dict[int, list] = {}
    rows = bm25.keywords(k=3, docs_filter=F.col("doc_id") < 30).collect()
    for r in sorted(rows, key=lambda r: (r.doc_id, r.rank)):
        got.setdefault(r.doc_id, []).append((r.term, r.score))
    assert set(got) == set(want)
    for d in want:
        assert [w for w, _ in got[d]] == [w for w, _ in want[d]]
        for (_, gs), (_, ws) in zip(got[d], want[d]):
            assert gs == pytest.approx(ws, abs=2e-6)


def test_tfidf_keywords_filter_does_not_reweight(docs, bm25):
    """docs_filter restricts OUTPUT docs only — scores are computed
    against corpus-wide df, so a filtered report equals the slice of
    the unfiltered one."""
    full = {(r.doc_id, r.rank): (r.term, r.score)
            for r in bm25.keywords(k=2).collect() if r.doc_id < 10}
    part = {(r.doc_id, r.rank): (r.term, r.score)
            for r in bm25.keywords(k=2, docs_filter=F.col("doc_id") < 10).collect()}
    assert full == part


def test_list_query_entries_are_tokenized(bm25):
    """A list entry containing a space means the terms it reads as —
    the indexed vocabulary never contains a space, so treating the
    entry as one term would silently match nothing."""
    joined = bm25.search(["hash join"], limit=5).collect()
    split = bm25.search("hash join", limit=5).collect()
    assert [(r[0], r[1]) for r in joined] == [(r[0], r[1]) for r in split]


def test_empty_queries_raise(bm25):
    import pytest as _pytest

    from vearch_spark.errors import SearchError

    with _pytest.raises(SearchError, match="empty query"):
        bm25.search([""])
    with _pytest.raises(SearchError, match="empty query at index 1"):
        bm25.search_batch(["hash", "  "])
    with _pytest.raises(SearchError, match="empty query batch"):
        bm25.search_batch([])


def test_fit_empty_corpus_raises(spark):
    import pytest as _pytest

    from vearch_spark.errors import SearchError
    from vearch_spark.operators.retrieval import BM25Index

    empty = spark.createDataFrame([], "doc_id long, text string")
    with _pytest.raises(SearchError, match="empty corpus"):
        BM25Index().fit(empty)
