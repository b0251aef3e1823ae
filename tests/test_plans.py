"""Physical-plan regression tests — the 100 TB posture.

Every assertion here is a scale property: if one regresses, the
operator still returns correct rows at test SF but would fall over at
1000 executors (global sort instead of top-k merge, full-schema scan,
unexpected shuffle, sort-merge join of a tiny side...).
"""

import pytest
from pyspark.sql import functions as F

from vearch_spark.operators import topk
from vearch_spark.operators.fusion import VectorQuery, multi_vector_search
from vearch_spark.plans import explain as X

Q = [0.1] * 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_search_is_take_ordered_no_shuffle(emb):
    df = topk.search(emb, "embedding", Q, limit=10, id_col="vec_id")
    assert X.uses_take_ordered(df)          # per-partition top-k + merge
    assert X.count_exchanges(df) == 0       # zero shuffles end-to-end


def test_search_filter_pushdown_and_pruning(emb):
    df = topk.search(
        emb, "embedding", Q, limit=10, id_col="vec_id", flt=F.col("label") < 5
    )
    pushed = " ".join(X.pushed_filters(df))
    assert "label" in pushed                # predicate reaches the scan
    schemas = X.read_schemas(df)
    assert schemas and "label" in schemas[0]
    # only the 3 needed columns are read, not a full-width scan
    assert schemas[0].count(":") == 3


def test_search_offset_stays_take_ordered(emb):
    df = topk.search(emb, "embedding", Q, limit=10, offset=7, id_col="vec_id")
    plan = X.simple_plan(df)
    assert "TakeOrderedAndProject" in plan and "offset=7" in plan


def test_batch_search_broadcasts_queries(spark, emb):
    queries = spark.createDataFrame(
        [(0, [0.1] * 64), (1, [0.2] * 64)], "query_id int, query_vec array<double>"
    )
    df = topk.search_batch(emb, "embedding", queries, limit=5, id_col="vec_id")
    assert X.uses_broadcast(df)             # docs side never shuffles for the join
    assert X.count_exchanges(df) <= 1       # only the per-query window exchange


def test_fusion_join_is_broadcast(emb):
    df = multi_vector_search(
        emb,
        [VectorQuery("embedding", Q), VectorQuery("embedding", [0.2] * 64)],
        limit=5,
        metric="InnerProduct",
        per_field_k=50,
        id_col="vec_id",
    )
    assert X.uses_broadcast(df)
    plan = X.formatted_plan(df)
    assert "SortMergeJoin" not in plan      # tiny top-k sides must not SMJ


def test_groupby_dedup_single_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from vearch_spark.operators.dedup import exact_dedup

    df = exact_dedup(docs, key=["text"], id_col="doc_id")
    assert X.count_exchanges(df) == 1       # one hash shuffle, map-side partials


def test_scan_aggregate_prunes_columns(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    schemas = X.read_schemas(df)
    assert schemas and schemas[0].count(":") == 2  # 2 of 11 columns read


def test_ivf_batch_probe_join_is_broadcast(spark, emb):
    """Batched ANN: the probe relation broadcasts (docs never shuffle
    for the join) and per-query top-k is window-limited, one exchange."""
    from vearch_spark.operators.ivf import IVFFlatIndex
    from vearch_spark.schema import Metric

    index = IVFFlatIndex("embedding", Metric.L2, ncentroids=8, nprobe=4, id_col="vec_id")
    index.fit(emb)
    try:
        df = index.search_batch([Q, [0.2] * 64], limit=5)
        assert X.uses_broadcast(df)
        assert X.count_exchanges(df) <= 1
        plan = X.simple_plan(df)
        assert "WindowGroupLimit" in plan   # rank filter applied map-side
    finally:
        index.unpersist()


def test_binary_ivf_search_no_shuffle(spark, emb):
    """BINARYIVF: probe filter prunes the cached assigned table and the
    Hamming top-k is TakeOrderedAndProject — zero shuffles, same shape
    as FLAT search."""
    from vearch_spark.operators.ivf import BinaryIVFIndex

    codes = emb.select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda j: (F.element_at("embedding", j * 8 + 1) > 0.5).cast("int"),
        ).alias("code"),
    )
    index = BinaryIVFIndex("code", ncentroids=8, nprobe=4, id_col="vec_id")
    index.fit(codes)
    try:
        df = index.search(None, [1, 0, 1, 0, 1, 0, 1, 0], limit=5)
        assert X.uses_take_ordered(df)
        assert X.count_exchanges(df) == 0
        assert "_cluster_id" in X.simple_plan(df)  # probe pruning applied
    finally:
        index.unpersist()


def test_decontaminate_eval_side_broadcasts(spark, sf_dir):
    import __spark_entry__ as entry

    df = entry.q_decontaminate(spark, sf_dir)
    # the eval shingle set rides to the scan side as a broadcast — the
    # corpus-sized postings relation never shuffles for the semi join
    assert X.uses_broadcast(df)


def test_pii_redaction_is_pure_projection(spark, sf_dir):
    import __spark_entry__ as entry

    df = entry.q_pii_redaction(spark, sf_dir)
    plan = X.formatted_plan(df)
    # whole pass is JVM regex inside codegen: no Python evaluation node
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only exchange is the final presentation orderBy
    assert X.count_exchanges(df) <= 1


def test_repetition_scores_single_shuffle_per_agg(spark, sf_dir):
    import __spark_entry__ as entry

    df = entry.q_repetition_scores(spark, sf_dir)
    plan = X.formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hash_sample_is_narrow(spark, sf_dir):
    from vearch_spark.operators.sample import hash_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = hash_sample(docs, {"src1": 0.5}, id_col="doc_id", stratum_col="source")
    # sampling is a pure filter projection: zero exchanges, no Python
    assert X.count_exchanges(df) == 0
    plan = X.formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sq8_encode_is_narrow(spark, sf_dir):
    from vearch_spark.operators.sq import SQ8Quantizer

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = SQ8Quantizer("embedding", id_col="vec_id").fit(emb)
    df = q.encode(emb)
    assert X.count_exchanges(df) == 0
    plan = X.formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cluster_balanced_sample_quota_is_map_side(spark, sf_dir):
    import numpy as np

    from vearch_spark.operators.sample import cluster_balanced_sample

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = np.random.default_rng(0).random((8, 64))
    df = cluster_balanced_sample(emb, cents, id_col="vec_id", per_cluster=5)
    plan = X.formatted_plan(df)
    # the per-cluster quota must be applied before the exchange
    # (WindowGroupLimit), so a crowded cluster never ships its full
    # population; assignment is the one Arrow-batched pass
    assert "WindowGroupLimit" in plan
    assert X.count_exchanges(df) == 1


def test_upsert_lww_merge_is_aggregation_not_window(spark, sf_dir):
    import __spark_entry__ as entry

    df = entry.q_upsert_lww(spark, sf_dir)
    plan = X.formatted_plan(df)
    # the LWW pick must be an aggregation with a partial (map-side)
    # phase, never a rank window shuffling the whole update log.
    # max(struct) lowers to SortAggregate, so assert on the pick's own
    # node: a partial SortAggregate over _id BEFORE the exchange
    assert "Window" not in plan
    assert "SortAggregate" in plan
    assert "partial_max" in plan  # the map-side combine of the pick


def test_bm25_search_single_shuffle_topk(spark, sf_dir):
    """BM25 per-query work: term-pruned postings -> broadcast idf join
    -> ONE doc-rollup exchange -> TakeOrdered merge. The postings
    relation is never reshuffled wholesale per query."""
    from vearch_spark.operators.retrieval import BM25Index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = BM25Index(text_col="text", id_col="doc_id").fit(docs)
    df = idx.search("hash join spark window", limit=20)
    assert X.count_exchanges(df) == 1
    assert X.uses_take_ordered(df)
    assert X.uses_broadcast(df)
    idx.unpersist()


def test_lm_score_broadcast_model_single_shuffle(spark, sf_dir):
    """LM scoring: bigram/unigram model relations broadcast to the
    exploded pairs; the only exchange is the per-doc rollup."""
    from vearch_spark.operators.lm import BigramLM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = BigramLM(text_col="text").fit(docs)
    df = lm.score(docs)
    assert X.count_exchanges(df) == 1
    assert X.uses_broadcast(df)
    lm.unpersist()


def test_span_dedup_two_shuffles_pruned_scan(spark, sf_dir):
    """Substring dedup: occurrence window over the span hash + per-doc
    rollup = exactly two exchanges of (id, pos, hash) triples; the scan
    reads only (doc_id, text); no pair join exists anywhere (a corpus
    of identical docs stays linear)."""
    from vearch_spark.operators.dedup import duplicated_span_stats

    # a cached full-width documents relation (another module's fixture)
    # would satisfy the scan and hide the pruning this test pins
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = duplicated_span_stats(docs, window=12)
    assert X.count_exchanges(df) == 2
    plan = X.simple_plan(df)
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    schemas = X.read_schemas(df)
    assert all(s.count(":") <= 2 for s in schemas)  # doc_id[,text] only


def test_substring_removal_two_shuffles_no_pair_join(spark, sf_dir):
    """Substring REMOVAL keeps the accounting op's shape: keeper
    election windows over the span hash (exchange 1), the interval
    merge windows over doc_id (exchange 2, reused by the groupBys),
    and the islands relation joins back to the scan without a pair
    join — excision is a pure JVM array pipeline. Scan reads only
    (doc_id, text)."""
    from vearch_spark.operators.dedup import remove_duplicate_spans

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = remove_duplicate_spans(docs, window=12)
    assert X.count_exchanges(df) == 2
    plan = X.simple_plan(df)
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    schemas = X.read_schemas(df)
    assert all(s.count(":") <= 2 for s in schemas)


def test_count_exchanges_sees_roundrobin(spark):
    """repartition() is a real shuffle (RoundRobinPartitioning) — the
    zero-shuffle posture assertions must count it."""
    df = spark.range(100).repartition(8)
    assert X.count_exchanges(df) >= 1


def test_pushed_filters_handles_nested_in(spark, tmp_path):
    """In(...) nests brackets; filters after it must not be dropped."""
    p = str(tmp_path / "pf.parquet")
    spark.createDataFrame(
        [(1, "a", 5), (2, "b", 9)], "id int, f string, q int"
    ).write.parquet(p)
    df = (
        spark.read.parquet(p)
        .where(F.col("f").isin("a", "b") & (F.col("q") > 5))
        .select("id")
    )
    pushed = " ".join(X.pushed_filters(df))
    assert "In(f" in pushed
    assert "GreaterThan(q,5)" in pushed


def test_binary_ivf_batch_probe_join_is_broadcast(spark, emb):
    """Batched Hamming ANN (BinaryIVFIndex.search_batch): same physical
    shape as the float batch — tiny probe relation broadcasts, docs
    never shuffle for the join, per-query top-k window-limited
    map-side, one exchange."""
    from vearch_spark.operators.ivf import BinaryIVFIndex

    codes = emb.select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda j: (F.element_at("embedding", j * 8 + 1) > 0.5).cast("int"),
        ).alias("code"),
    )
    index = BinaryIVFIndex("code", ncentroids=8, nprobe=4, id_col="vec_id")
    index.fit(codes)
    try:
        df = index.search_batch([[1, 0, 1, 0, 1, 0, 1, 0],
                                 [0, 1, 0, 1, 0, 1, 0, 1]], limit=5)
        assert X.uses_broadcast(df)
        assert X.count_exchanges(df) <= 1
        assert "WindowGroupLimit" in X.simple_plan(df)
        assert "_cluster_id" in X.simple_plan(df)  # probe pruning applied
    finally:
        index.unpersist()


def test_exact_hamming_batch_is_broadcast_window(spark, emb):
    """Exact Hamming batch scan (topk.search_batch binary=True): the
    query relation broadcasts against ONE docs scan and the rank
    window is map-side limited — the docs side shuffles once (on
    query_id), exactly like the float exact batch."""
    from vearch_spark.operators import topk

    codes = emb.select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda j: (F.element_at("embedding", j * 8 + 1) > 0.5).cast("int"),
        ).alias("code"),
    )
    qdf = spark.createDataFrame(
        [(0, [1, 0, 1, 0, 1, 0, 1, 0]), (1, [0, 1, 0, 1, 0, 1, 0, 1])],
        "query_id int, query_vec array<int>",
    )
    df = topk.search_batch(codes, "code", qdf, limit=5, id_col="vec_id",
                           binary=True)
    assert X.uses_broadcast(df)
    assert X.count_exchanges(df) <= 1
    assert "WindowGroupLimit" in X.simple_plan(df)


def test_shuffle_shards_single_exchange(spark):
    """Shuffled-shard export: one narrow projection + exactly the ONE
    exchange the physical shard write needs anyway (the rank window on
    shard) — deterministic epoch order is free at 100 TB."""
    from vearch_spark.operators.sample import shuffle_shards

    docs = spark.range(1000).withColumnRenamed("id", "doc_id")
    df = shuffle_shards(docs, 8, seed=1)
    assert X.count_exchanges(df) == 1
    assert "WindowGroupLimit" not in X.simple_plan(df)  # full ranks, no limit


def test_bucketed_cosine_plan_no_pair_join(spark, sf_dir):
    """r6 VERDICT ask #4: the bucketed cosine near-dup path — the plan
    that runs at 100 TB — must compile to a single hash exchange on
    the bucket key feeding FlatMapGroupsInPandas (per-bucket BLAS
    kernel). No crossJoin, no pair join of any kind, no broadcast of
    the full relation: pair emission happens inside the grouped
    kernel, so the quadratic never appears in the plan."""
    from vearch_spark.operators.dedup import embedding_cosine_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bucket = sum(
        (F.element_at("embedding", j + 1) > 0).cast("int") * (1 << j)
        for j in range(4)
    )
    out = embedding_cosine_pairs(
        emb.withColumn("_bkt", bucket),
        vec_col="embedding",
        id_col="vec_id",
        threshold=0.4,
        bucket_col="_bkt",
        max_bucket=100_000,
        kernel="blas",
    )
    plan = X.formatted_plan(out)
    assert "FlatMapGroupsInPandas" in plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert bad not in plan, bad
    # exactly ONE exchange: the hash partition on the bucket key
    assert X.count_exchanges(out) == 1


def test_domain_cap_single_window_exchange(spark):
    """domain_cap = narrow JVM regex projection + ONE shuffle (the
    rank window on domain); the cap filter applies as WindowGroupLimit
    so the exchange never carries more than cap rows per domain per
    partition map-side."""
    from vearch_spark.operators.sample import domain_cap

    df = spark.createDataFrame(
        [(i, f"https://w{i % 3}.site{i % 4}.com/p/{i}") for i in range(100)],
        "doc_id long, url string",
    )
    out = domain_cap(df, cap=3, seed=1)
    assert X.count_exchanges(out) == 1
    plan = X.formatted_plan(out)
    assert "WindowGroupLimit" in plan  # cap applied map-side pre-shuffle


def test_frame_sample_queries_are_narrow_pipelines(spark, sf_dir):
    """The GIF/AVI frame-sample queries are mapInPandas chains: media
    binaries flow executor-side through Arrow and the only exchange is
    the final presentation sort — no join, no aggregation shuffle."""
    import __spark_entry__ as entry

    for q in (entry.q_gif_frame_sample, entry.q_video_frame_sample):
        out = q(spark, sf_dir)
        plan = X.formatted_plan(out)
        for bad in ("Join", "HashAggregate", "Window"):
            assert bad not in plan, (q.__name__, bad)
        # two exchanges: the r9 input spread (round-robin over doc ids
        # ONLY — synthesis happens after it, so binaries still never
        # shuffle) + the range partitioning of the final orderBy
        assert X.count_exchanges(out) <= 2, q.__name__
        assert "RoundRobinPartitioning" in plan, q.__name__


def test_media_probe_is_narrow_pipeline(spark, sf_dir):
    """media_probe synthesizes + header-probes all 13 containers inside
    one Arrow batch — binaries never shuffle; the only exchange is the
    final presentation sort. No join, no aggregation, no window."""
    import __spark_entry__ as entry

    out = entry.q_media_probe(spark, sf_dir)
    plan = X.formatted_plan(out)
    for bad in ("Join", "HashAggregate", "Window"):
        assert bad not in plan, bad
    # input spread (doc ids only, pre-synthesis) + orderBy
    assert X.count_exchanges(out) <= 2
    assert "RoundRobinPartitioning" in plan


def test_pdf_extract_is_narrow_pipeline(spark, sf_dir):
    """pdf_extract typesets + re-extracts each doc inside one Arrow
    batch — PDFs never shuffle; the only exchange is the presentation
    sort, and the scan reads only (doc_id, text)."""
    import __spark_entry__ as entry

    spark.catalog.clearCache()
    out = entry.q_pdf_extract(spark, sf_dir)
    plan = X.formatted_plan(out)
    for bad in ("Join", "HashAggregate", "Window"):
        assert bad not in plan, bad
    # input spread (doc_id+text, pre-typesetting: PDFs never shuffle)
    # + the presentation sort
    assert X.count_exchanges(out) <= 2
    assert "RoundRobinPartitioning" in plan
    schemas = X.read_schemas(out)
    assert all(s.count(":") <= 2 for s in schemas)


def test_containment_pairs_no_cartesian(spark, sf_dir):
    """containment_pairs keeps the inverted-index join shape: the hot-
    shingle cap is a broadcast anti-join, the pair join is shingle-
    keyed (never a cartesian), and the two directed projections reuse
    one pair relation."""
    import __spark_entry__ as entry

    # r10: no result-level cache — the builder returns the live pair
    # join over the session-cached postings index on every call
    out = entry.q_containment_pairs(spark, sf_dir)
    plan = X.formatted_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # df-cap anti-join stays broadcast
    # the pair join is LIVE in the plan (pair self-join + two size
    # joins at least) — not a scan of a persisted result
    assert plan.count("Join") >= 3


def test_audio_segments_single_keyed_exchange(spark, sf_dir):
    """audio_segments does its three keyed steps — the row_number
    window, the (media_id, grp) island aggregation, and the seg_idx
    window — on ONE media_id hash exchange (HashPartitioning on a
    subset of the grouping keys satisfies the aggregation's required
    distribution), plus the presentation sort and the r9 round-robin
    spread of the narrow pre-synthesis input (the one-row-group scan
    otherwise serializes the WAV decode into a single task). No join;
    binaries never shuffle (the WAV decode happens inside the Arrow
    stage, above the spread)."""
    import __spark_entry__ as entry

    out = entry.q_audio_segments(spark, sf_dir)
    plan = X.formatted_plan(out)
    assert "Join" not in plan
    assert plan.count("RoundRobinPartitioning") == 1  # the spread
    assert X.count_exchanges(out) <= 3  # spread + media_id hash + sort


def test_html_extract_is_pure_projection(spark, sf_dir):
    """html_extract is a narrow JVM regex projection — the only
    exchange is the presentation sort; no Python, no join, no agg."""
    import __spark_entry__ as entry

    out = entry.q_html_extract(spark, sf_dir)
    plan = X.formatted_plan(out)
    for bad in ("Join", "HashAggregate", "FlatMapGroupsInPandas",
                "ArrowEvalPython", "BatchEvalPython"):
        assert bad not in plan, bad
    assert X.count_exchanges(out) <= 1  # orderBy only


def test_gopher_repetition_id_keyed_no_pair_join(spark, sf_dir):
    """The repetition filter is intra-document — r9 plans it as ONE
    Arrow batch pass (the measured-UDF exception, like lang_id): no
    join, no window, no aggregation exchange; the scan reads only
    (doc_id, text)."""
    from vearch_spark.operators.dedup import gopher_repetition_stats

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = gopher_repetition_stats(docs)
    plan = X.simple_plan(df)
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    for bad in ("Join", "Window", "HashAggregate"):
        assert bad not in plan, bad
    assert X.count_exchanges(df) == 0
    schemas = X.read_schemas(df)
    assert len(schemas) == 1
    assert all(s.count(":") <= 2 for s in schemas)  # doc_id[,text]


def test_warc_extract_is_narrow_pipeline(spark, sf_dir):
    """warc_extract writes and re-parses real .warc.gz containers
    inside one Arrow batch — payloads never shuffle; only the
    presentation sort exchanges, and the scan reads (doc_id, text)."""
    import __spark_entry__ as entry

    spark.catalog.clearCache()
    out = entry.q_warc_extract(spark, sf_dir)
    plan = X.formatted_plan(out)
    for bad in ("Join", "HashAggregate", "Window"):
        assert bad not in plan, bad
    # input spread (doc_id+text, pre-synthesis: .warc.gz payloads
    # never shuffle) + the presentation sort
    assert X.count_exchanges(out) <= 2
    assert "RoundRobinPartitioning" in plan
    schemas = X.read_schemas(out)
    assert all(s.count(":") <= 2 for s in schemas)


def test_robots_filter_is_narrow_pipeline(spark, sf_dir):
    """robots_filter and sitemap_discover evaluate crawl-compliance /
    discovery decisions inside one Arrow batch — no join, no agg; the
    r9 round-robin spread of the narrow doc_id input (one-row-group
    scan) plus the presentation sort are the only exchanges, scans
    read doc_id alone."""
    import __spark_entry__ as entry

    spark.catalog.clearCache()
    for q in (entry.q_robots_filter, entry.q_sitemap_discover):
        out = q(spark, sf_dir)
        plan = X.formatted_plan(out)
        for bad in ("Join", "HashAggregate", "Window"):
            assert bad not in plan, (q.__name__, bad)
        assert plan.count("RoundRobinPartitioning") == 1, q.__name__
        assert X.count_exchanges(out) <= 2, q.__name__
        schemas = X.read_schemas(out)
        assert all(s.count(":") <= 1 for s in schemas)  # doc_id only


def test_c4_and_script_profile_are_pure_projections(spark, sf_dir):
    """Both published-rule filters are narrow JVM projections — no
    Python, no join, no agg; only the presentation sort exchanges."""
    import __spark_entry__ as entry

    for q in (entry.q_c4_filter, entry.q_script_profile):
        out = q(spark, sf_dir)
        plan = X.formatted_plan(out)
        for bad in ("Join", "HashAggregate", "FlatMapGroupsInPandas",
                    "ArrowEvalPython", "BatchEvalPython"):
            assert bad not in plan, (q.__name__, bad)
        assert X.count_exchanges(out) <= 1  # orderBy only


def test_gopher_quality_is_pure_projection(spark, sf_dir):
    """The Gopher ruleset is pure JVM expressions (splits let-bound
    via a single-element transform) — no Python, no join, no agg;
    only the presentation sort exchanges."""
    import __spark_entry__ as entry

    out = entry.q_gopher_quality(spark, sf_dir)
    plan = X.formatted_plan(out)
    for bad in ("Join", "HashAggregate", "FlatMapGroupsInPandas",
                "ArrowEvalPython", "BatchEvalPython"):
        assert bad not in plan, bad
    assert X.count_exchanges(out) <= 1  # orderBy only


def test_url_dedup_single_aggregation_exchange(spark, sf_dir):
    """canonical_url is a pure JVM expression chain (regex +
    array_sort — no Python anywhere), so the url_dedup query's only
    shuffles are the canonical-key aggregation and the presentation
    sort, with map-side partial aggregation collapsing variant groups
    before the exchange."""
    import __spark_entry__ as entry

    out = entry.q_url_dedup(spark, sf_dir)
    plan = X.formatted_plan(out)
    for bad in ("Join", "ArrowEvalPython", "BatchEvalPython",
                "FlatMapGroupsInPandas", "Window"):
        assert bad not in plan, bad
    assert X.count_exchanges(out) <= 2  # groupBy + orderBy
    assert plan.count("HashAggregate") >= 2  # partial + final
