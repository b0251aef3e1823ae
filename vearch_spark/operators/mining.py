"""Contrastive-training data mining over embedding tables.

``hard_negatives`` serves the standard contrastive/embedding-training
recipe: for each anchor, the k nearest corpus rows carrying a DIFFERENT
label — the "hard" negatives that sit closest to the decision boundary.
(Positives are same-label rows; negatives sampled uniformly are easy
and carry little gradient, so pipelines mine the near-boundary ones.)

Physical shape (the batched-search pattern, see
``IVFFlatIndex.search_batch``): the anchor set broadcasts, the corpus
is scanned ONCE and each row scored only against the broadcast
anchors; the per-anchor top-k is a rank window on the anchor id, which
Spark's WindowGroupLimit applies map-side — the one exchange carries
at most ``anchors × k`` rows per partition, never the scored corpus.

Scale notes: the anchor set must be broadcast-bounded (≈ up to a few
hundred thousand rows of (id, vec, label)); for corpus-scale anchor
sets, run in anchor batches, or block both sides by IVF cell first
(the ``bucket_col`` recipe of ``dedup.embedding_cosine_pairs``) so the
join keys on cluster id instead of broadcasting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vearch_spark.functions.distance import score_expr
from vearch_spark.operators.topk import _score_order
from vearch_spark.schema import Metric


def hard_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    label_col: str = "label",
    k: int = 5,
    metric: Metric | str = Metric.L2,
) -> DataFrame:
    """Per-anchor top-``k`` nearest rows with a different label.

    Returns ``(anchor_id, <id_col>, <label_col>, _score)`` — for L2 the
    k smallest distances among wrong-label rows (ascending), for IP the
    k largest similarities (descending); ties break on the corpus id.
    Self-pairs need no special case: an anchor's own row shares its
    label, so the wrong-label test already excludes it (along with all
    other same-label rows — the positives). NULL labels compare
    null-safely: NULL is its own label class (unlabeled rows are
    negatives for every labeled anchor and vice versa) — a plain ``!=``
    would silently drop every anchor or candidate with a NULL label.
    """
    metric = Metric.parse(metric) if isinstance(metric, str) else metric
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
        F.col(label_col).alias("_albl"),
    )
    joined = corpus.join(
        F.broadcast(a), on=~corpus[label_col].eqNullSafe(F.col("_albl")), how="inner"
    )
    scored = joined.withColumn(
        "_score", score_expr(F.col(vec_col), F.col("_qv"), metric)
    )
    w = Window.partitionBy("anchor_id").orderBy(
        _score_order(metric, F.col("_score")), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= int(k))
        .select("anchor_id", id_col, label_col, "_score")
    )
