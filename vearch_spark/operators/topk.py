"""Exact top-k-by-distance search (the reference's FLAT path).

The reference's search pipeline (Engine::Search engine.cc:248-408 →
VectorManager::Search vector_manager.cc:851-1199) is:

    scalar pre-filter → distance scoring → score-band discard →
    per-partition top-(k+offset) → k-way merge → offset skip → project

Spark-first, that entire pipeline is ONE declarative plan:

    df.where(filter)                       # pre-filter (engine.cc:355-373)
      .withColumn("_score", score_expr)    # JVM distance kernel
      .where(score band)                   # min/max_score (gamma_common_data.h:94-96)
      .orderBy(score).offset(o).limit(k)   # TakeOrderedAndProject

``ORDER BY ... LIMIT k`` plans as ``TakeOrderedAndProject`` — Spark
computes a per-partition top-k and merges on the driver, which is
exactly the reference's per-partition top-k + router k-way merge
(client.go:1497-1576) with no extra shuffle. This holds at any
partition count, so the same plan serves 1000 executors over 100 TB.

Batched multi-query search (one request = q independent queries,
parseVectors doc_query.go:255-338) uses a *broadcast* of the (small)
query set against the (huge) docs table plus a per-query window top-k —
no shuffle of the docs side beyond one hash exchange on query_id, and
the window's rank filter is applied partially before the exchange by
Spark's WindowGroupLimit optimization.

Tie-breaking: the reference's merge order for equal scores depends on
partition arrival (client.go:869-877) — nondeterministic. We define the
documented total order (score, then _id) so results are reproducible
and oracle-checkable (SURVEY.md §7 "what's hard" (a)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from vearch_spark.errors import SearchError
from vearch_spark.filters import compile_filter
from vearch_spark.functions.distance import array_lit, l2_normalize, score_expr
from vearch_spark.schema import ID_FIELD, Metric, SpaceSchema

DEFAULT_LIMIT = 50  # DefaultSize doc_query.go:43


def _score_order(metric: Metric, score: Column) -> Column:
    # NULLS LAST both ways: a NULL score (null/ragged vector) must
    # never outrank a real hit — bare .asc() is NULLS FIRST in Spark,
    # which would hand rank 1 to unscoreable rows on every L2 search
    return score.asc_nulls_last() if metric.ascending else score.desc_nulls_last()


def _apply_score_band(
    df: DataFrame, score: Column, min_score: float | None, max_score: float | None
) -> DataFrame:
    # IsSimilarScoreValid gamma_common_data.h:94-96 — candidates outside
    # [min_score, max_score] are discarded before top-k.
    if min_score is not None:
        df = df.where(score >= float(min_score))
    if max_score is not None:
        df = df.where(score <= float(max_score))
    return df


def search(
    df: DataFrame,
    vector_col: str,
    query: Sequence[float],
    limit: int = DEFAULT_LIMIT,
    metric: str | Metric = Metric.L2,
    flt: dict | Column | None = None,
    schema: SpaceSchema | None = None,
    min_score: float | None = None,
    max_score: float | None = None,
    offset: int = 0,
    l2_sqrt: bool = False,
    normalize: bool = False,
    id_col: str = ID_FIELD,
    output_fields: list[str] | None = None,
    vector_value: bool = False,
    score_col: str = "_score",
) -> DataFrame:
    """Single-query exact top-k (FLAT, gamma_index_flat.cc semantics).

    Returns output fields + ``_score``, ordered by score (L2 asc / IP
    desc, doc_query.go:1526-1528), ties broken by ``id_col``.
    """
    m = Metric.parse(metric) if isinstance(metric, str) else metric
    if limit <= 0:
        raise SearchError(f"limit must be positive, got {limit}")
    if offset < 0:
        raise SearchError(f"offset must be >= 0, got {offset}")

    q: Sequence[float] | Column = query
    if normalize:
        # router-side query normalization (client.go:603-658)
        q = l2_normalize(array_lit(query))

    pred = compile_filter(flt, schema)
    if pred is not None:
        df = df.where(pred)  # pre-filter BEFORE scoring (engine.cc:355-373)

    score = score_expr(F.col(vector_col), q, m, l2_sqrt=l2_sqrt)
    scored = df.withColumn(score_col, score)
    scored = _apply_score_band(scored, F.col(score_col), min_score, max_score)

    cols = _output_cols(df, vector_col, id_col, output_fields, vector_value, score_col)
    ordered = scored.select(*cols).orderBy(
        _score_order(m, F.col(score_col)), F.col(id_col).asc()
    )
    if offset:
        # engine fetches topn+offset then skips (vector_manager.cc:924)
        ordered = ordered.offset(offset)
    return ordered.limit(limit)


def search_batch(
    df: DataFrame,
    vector_col: str,
    queries: DataFrame,
    query_vec_col: str = "query_vec",
    query_id_col: str = "query_id",
    limit: int = DEFAULT_LIMIT,
    metric: str | Metric = Metric.L2,
    flt: dict | Column | None = None,
    schema: SpaceSchema | None = None,
    min_score: float | None = None,
    max_score: float | None = None,
    offset: int = 0,
    l2_sqrt: bool = False,
    id_col: str = ID_FIELD,
    output_fields: list[str] | None = None,
    vector_value: bool = False,
    score_col: str = "_score",
    binary: bool = False,
) -> DataFrame:
    """Batched multi-query top-k: one row per (query_id, hit).

    ``queries`` is a small DataFrame (query_id, query_vec) — broadcast
    against the docs table; per-query top-k via a rank window
    partitioned by query_id (SURVEY.md §4 custom op (4)).

    ``binary``: score by Hamming distance over packed uint8 codes
    (the BINARYIVF brute form, gamma_index_binary_ivf.cc) instead of
    the float metric — ascending, like L2. The reference's parseVectors
    accepts req_num batches of q×(d/8) byte codes (doc_query.go:
    296-309); without this flag the float kernel would silently score
    L2² over the raw bytes.
    """
    m = Metric.parse(metric) if isinstance(metric, str) else metric
    if limit <= 0:
        raise SearchError(f"limit must be positive, got {limit}")
    if offset < 0:
        raise SearchError(f"offset must be >= 0, got {offset}")
    pred = compile_filter(flt, schema)
    if pred is not None:
        df = df.where(pred)

    joined = df.crossJoin(F.broadcast(queries))
    if binary:
        from vearch_spark.functions.distance import hamming_distance

        m = Metric.L2  # Hamming sorts ascending, same as L2
        score = hamming_distance(F.col(vector_col), F.col(query_vec_col))
    else:
        score = score_expr(F.col(vector_col), F.col(query_vec_col), m, l2_sqrt=l2_sqrt)
    scored = joined.withColumn(score_col, score)
    scored = _apply_score_band(scored, F.col(score_col), min_score, max_score)

    w = Window.partitionBy(query_id_col).orderBy(
        _score_order(m, F.col(score_col)), F.col(id_col).asc()
    )
    ranked = scored.withColumn("_rank", F.row_number().over(w))
    lo, hi = offset, offset + limit
    out = ranked.where((F.col("_rank") > lo) & (F.col("_rank") <= hi))

    cols = [F.col(query_id_col)] + _output_cols(
        df, vector_col, id_col, output_fields, vector_value, score_col
    )
    return out.select(*cols)


def search_meta(
    df: DataFrame,
    vector_col: str,
    query: Sequence[float],
    metric: str | Metric = Metric.L2,
    flt: dict | Column | None = None,
    schema: SpaceSchema | None = None,
    min_score: float | None = None,
    max_score: float | None = None,
    l2_sqrt: bool = False,
) -> DataFrame:
    """Per-search result metadata: ``total`` (candidate count after
    filter + score band) and the best score (``max_score`` in the
    reference's response, response.cc:256-312 — for L2 that is the
    minimum distance)."""
    m = Metric.parse(metric) if isinstance(metric, str) else metric
    pred = compile_filter(flt, schema)
    if pred is not None:
        df = df.where(pred)
    score = score_expr(F.col(vector_col), query, m, l2_sqrt=l2_sqrt)
    scored = df.select(score.alias("_score"))
    # unscoreable rows (NULL/ragged vector → NULL score) can never be
    # returned as hits, so they must not inflate `total` either
    scored = scored.where(F.col("_score").isNotNull())
    scored = _apply_score_band(scored, F.col("_score"), min_score, max_score)
    best = F.min("_score") if m.ascending else F.max("_score")
    return scored.agg(F.count("*").alias("total"), best.alias("best_score"))


def _output_cols(
    df: DataFrame,
    vector_col: str,
    id_col: str,
    output_fields: list[str] | None,
    vector_value: bool,
    score_col: str,
) -> list[Column]:
    """Projection rules (doc_query.go:1425-1459): ``_id`` always
    included; default = all scalar fields, vectors excluded unless
    ``vector_value``; ``_score`` synthesized. Engine-internal columns
    (``_seq``, ``_partition_name``) are never part of the default —
    the reference returns _id + user fields only (doc_query.go:
    1425-1434), and leaking them here made the search output schema
    depend on whether the brute or index path served the request."""
    if output_fields is None:
        from vearch_spark.schema import PARTITION_FIELD, SEQ_FIELD

        hidden = {SEQ_FIELD, PARTITION_FIELD} - {id_col}
        array_cols = {
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString().startswith("array<float")
            or f.dataType.simpleString().startswith("array<double")
        }
        array_cols.discard(id_col)
        names = [
            c
            for c in df.columns
            if c == id_col or (c not in array_cols and c not in hidden)
        ]
        if vector_value and vector_col not in names:
            names.append(vector_col)
    else:
        names = list(output_fields)
        if id_col in df.columns and id_col not in names:
            names.insert(0, id_col)  # _id force-included (doc_query.go:1450-1459)
        if vector_value and vector_col not in names:
            names.append(vector_col)
    return [F.col(n) for n in names] + [F.col(score_col)]
