"""Keyword retrieval (BM25) + reciprocal-rank hybrid fusion.

The reference is a vector database — its only ranker is the weighted
vector-score fusion (``WeightedRanker``, common_query_data.h:251-317).
A training-data / retrieval engine additionally needs the keyword side
and a principled way to fuse it with ANN hits; this module adds both as
first-class Spark-native operators:

- **BM25** (Okapi, Robertson et al.; the Lucene-standard variant):
  ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``,
  ``score(d,q) = Σ_t idf·tf / (tf + k1·(1 - b + b·dl/avgdl))``.
  The index is an inverted postings relation ``(term, doc_id, tf,
  doc_len)`` — the classic shape (the reference builds the same
  structure for scalar filters, inverted_index.cc). At search time the
  postings are FILTERED to the query's terms before anything else (a
  pushed ``term IN (...)`` predicate over the term-clustered relation),
  so per-query work is proportional to the query terms' posting lists,
  never the corpus: the plan that survives 100 TB.
- **RRF** (reciprocal rank fusion, Cormack/Clarke/Buettcher SIGIR'09):
  ``score(d) = Σ_lists 1/(rrf_k + rank_d)`` — the standard
  score-scale-free way to fuse BM25 and vector top-k lists. Inputs are
  already-merged top-k lists (bounded by construction), so the rank
  windows run on tiny relations.

Tokenization is the engine-wide ``functions.text.tokens`` (split on
single space) so BM25, dedup shingles and quality signals all agree —
and the DuckDB oracle can reproduce it exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F

from vearch_spark.errors import SearchError
from vearch_spark.functions.text import token_count, tokens


def _tokenized(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One tokenize pass per doc: (id, doc_len, token array). Postings
    AND corpus stats both derive from this relation so fit() never
    splits the corpus twice (split dominates on long documents)."""
    return docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("doc_len"),
        tokens(F.col(text_col)).alias("_tk"),
    )


def _postings_of(base: DataFrame, id_col: str) -> DataFrame:
    toks = base.select(
        F.col(id_col), F.col("doc_len"), F.explode("_tk").alias("term")
    )
    # the single-space tokenizer emits "" for doubled/trailing spaces;
    # query parsing drops empties too (_query_terms), so indexing ""
    # would build a dead, potentially corpus-sized posting list.
    # doc_len keeps counting empties — oracle parity.
    toks = toks.where(F.col("term") != "")
    return (
        toks.groupBy("term", id_col, "doc_len")
        .agg(F.count("*").alias("tf"))
        .repartitionByRange(F.col("term"))
        .sortWithinPartitions("term")
    )


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted postings: one row per (doc, term) with term frequency
    and doc length. One explode + one aggregation (map-side partial);
    the result is clustered by term so query-term filters prune cached
    batches / parquet row groups."""
    return _postings_of(_tokenized(docs, text_col, id_col), id_col)


def _query_terms(query: str | list[str]) -> list[str]:
    """Normalize a query to sorted unique non-empty terms. List entries
    go through the same single-space split as strings, so
    ``["hash join"]`` means the two terms it reads as — the indexed
    vocabulary can never contain a space or "" (build_postings drops
    them), so un-split entries would silently match nothing."""
    raw = query.split() if isinstance(query, str) else [
        t for entry in query for t in entry.split()
    ]
    return sorted({t for t in raw if t})


def _dfreq(postings: DataFrame) -> DataFrame:
    """Document frequency per term — the one definition BM25 scoring
    and TF-IDF keywords both join against (double-typed for the idf
    arithmetic)."""
    return postings.groupBy("term").agg(
        F.count("*").cast("double").alias("_df")
    )


class BM25Index:
    """Postings + corpus stats, with the engine's index surface."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        k1: float = 1.2,
        b: float = 0.75,
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.k1 = float(k1)
        self.b = float(b)
        self.postings: DataFrame | None = None
        self.n_docs: int | None = None
        self.avgdl: float | None = None

    def fit(self, docs: DataFrame) -> "BM25Index":
        # one tokenize pass: postings and corpus stats both read the
        # cached token relation (the BigramLM.fit pattern — a second
        # full-corpus split for n/avgdl doubled the expensive part)
        base = _tokenized(docs, self.text_col, self.id_col).persist()
        self.postings = _postings_of(base, self.id_col).persist()
        self.postings.count()
        row = base.select(
            F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
        ).first()
        base.unpersist()
        if not row["n"]:
            self.postings.unpersist()
            self.postings = None
            raise SearchError("cannot fit BM25 on an empty corpus")
        self.n_docs, self.avgdl = int(row["n"]), float(row["avgdl"])
        return self

    def _weight_expr(self, idf: Column) -> Column:
        dl_norm = self.k1 * (
            1.0 - self.b + self.b * F.col("doc_len") / F.lit(self.avgdl)
        )
        return idf * F.col("tf") / (F.col("tf") + dl_norm)

    def search(
        self,
        query: str | list[str],
        limit: int = 20,
        flt: Column | None = None,
        score_col: str = "_score",
    ) -> DataFrame:
        """Top-k docs for one query. The per-term idf is a two-row-ish
        distributed aggregate over the term-pruned postings, broadcast
        back — no corpus-wide work anywhere."""
        if self.postings is None:
            raise SearchError("index not trained")
        terms = _query_terms(query)
        if not terms:
            raise SearchError("empty query")
        p = self.postings.where(F.col("term").isin(terms))
        # idf uses corpus-wide document frequency (term-pruned only);
        # a result filter must not re-weight terms
        dfreq = _dfreq(p)
        if flt is not None:
            p = p.where(flt)
        n = float(self.n_docs)
        idf = F.log(
            F.lit(1.0) + (F.lit(n) - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
        )
        scored = (
            p.join(F.broadcast(dfreq), on="term")
            .withColumn("_w", self._weight_expr(idf))
            .groupBy(self.id_col)
            .agg(F.round(F.sum("_w"), 6).alias(score_col))
        )
        return scored.orderBy(
            F.col(score_col).desc(), F.col(self.id_col).asc()
        ).limit(limit)

    def search_batch(
        self,
        queries: list[str | list[str]],
        limit: int = 20,
        score_col: str = "_score",
    ) -> DataFrame:
        """All queries ride one postings pass: a broadcast (query_id,
        term) relation joins the term-pruned postings, per-query top-k
        is a rank window."""
        if self.postings is None:
            raise SearchError("index not trained")
        per_query = [_query_terms(q) for q in queries]
        empties = [qid for qid, ts in enumerate(per_query) if not ts]
        if empties:
            # fail loudly like single-query search — a silently absent
            # query_id is indistinguishable from "matched zero docs"
            raise SearchError(f"empty query at index {empties[0]}")
        pairs = [(qid, t) for qid, ts in enumerate(per_query) for t in ts]
        if not pairs:
            raise SearchError("empty query batch")
        spark = self.postings.sparkSession
        qrel = spark.createDataFrame(pairs, "query_id int, term string")
        all_terms = sorted({t for _, t in pairs})
        p = self.postings.where(F.col("term").isin(all_terms))
        dfreq = _dfreq(p)
        n = float(self.n_docs)
        idf = F.log(
            F.lit(1.0) + (F.lit(n) - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
        )
        scored = (
            p.join(F.broadcast(dfreq), on="term")
            .join(F.broadcast(qrel), on="term")
            .withColumn("_w", self._weight_expr(idf))
            .groupBy("query_id", self.id_col)
            .agg(F.round(F.sum("_w"), 6).alias(score_col))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col(score_col).desc(), F.col(self.id_col).asc()
        )
        return (
            scored.withColumn("_rank", F.row_number().over(w))
            .where(F.col("_rank") <= limit)
            .select("query_id", self.id_col, score_col)
        )

    def keywords(
        self, k: int = 5, docs_filter: Column | None = None
    ) -> DataFrame:
        """Per-doc TF-IDF keyword extraction over the fitted postings:
        ``score(t, d) = tf · ln(N / df)`` (df = docs containing t),
        top-k terms per doc by (score desc, term asc) — the keyword-
        tagging pass of a corpus-analysis pipeline (topical filtering,
        cluster labeling, index summaries).

        Scale shape: document frequency is one map-side-combined
        aggregation over the postings; the join back is term-to-term on
        the term-clustered relation (df is vocabulary-sized — NOT
        broadcast); the per-doc rank window shuffles (id, term, ints)
        once. Nothing rescans the corpus. ``docs_filter`` restricts the
        OUTPUT docs after idf is computed corpus-wide (a filtered
        report must not re-weight terms)."""
        if self.postings is None:
            raise SearchError("index not trained")
        dfreq = _dfreq(self.postings)
        p = self.postings
        if docs_filter is not None:
            p = p.where(docs_filter)
        scored = p.join(dfreq, on="term").withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.lit(float(self.n_docs)) / F.col("_df")), 6),
        )
        w = Window.partitionBy(self.id_col).orderBy(
            F.col("score").desc(), F.col("term").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(self.id_col, "term", "score", "rank")
        )

    def unpersist(self) -> None:
        if self.postings is not None:
            self.postings.unpersist()


def rrf_fuse(
    hits: list[tuple[DataFrame, bool]],
    id_col: str = "doc_id",
    rrf_k: int = 60,
    limit: int = 10,
    score_col: str = "_score",
    out_col: str = "rrf_score",
) -> DataFrame:
    """Reciprocal rank fusion over top-k lists.

    ``hits`` = [(df, ascending)] — each df carries (id_col, score_col);
    ``ascending`` is that list's score direction (L2 asc, IP/BM25 desc).
    Each list contributes ``1/(rrf_k + rank)``; missing docs contribute
    nothing (the standard definition). Inputs are top-k lists — already
    globally merged, bounded small — so the unpartitioned rank windows
    are single-task by construction, never corpus-scale."""
    if not hits:
        raise SearchError("rrf_fuse needs at least one hit list")
    contribs = []
    for df, ascending in hits:
        order = F.col(score_col).asc() if ascending else F.col(score_col).desc()
        # unpartitioned on purpose (inputs are bounded top-k lists; see
        # docstring) — a constant partition key would be stripped by
        # Spark 4's EliminateWindowPartitions rule anyway
        w = Window.orderBy(order, F.col(id_col).asc())
        contribs.append(
            df.select(
                F.col(id_col),
                (1.0 / (F.lit(rrf_k) + F.row_number().over(w))).alias("_c"),
            )
        )
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    fused = allc.groupBy(id_col).agg(F.round(F.sum("_c"), 6).alias(out_col))
    return fused.orderBy(F.col(out_col).desc(), F.col(id_col).asc()).limit(limit)
