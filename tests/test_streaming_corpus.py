"""Streaming corpus ingest with incremental dedup
(streaming/corpus.py). process_batch is foreachBatch's handler — the
deterministic tests drive it directly with static frames (epoch by
epoch), then one live rate-stream smoke proves the wiring."""

import time

import pytest
from pyspark.sql import functions as F

from vearch_spark.streaming.corpus import CorpusDeltaDedup

B1 = [
    (0, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (1, "completely different content about spark query engines and distributed joins here"),
    (2, "completely different content about spark query engines and distributed joins here"),  # in-batch exact dup of 1
]
B2 = [
    (10, "the quick brown fox jumps over the lazy dog near the old river bank today"),  # exact dup of corpus 0
    (11, "the quick brown fox jumps over the lazy dog near the old river bank tonight"),  # near dup of corpus 0
    (12, "entirely novel musings on watermarking and stateful stream processing semantics"),
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def ingest(spark, tmp_path):
    return CorpusDeltaDedup(str(tmp_path / "corpus"), jaccard_threshold=0.4)


def test_epochs_accumulate_and_dedup(spark, ingest):
    ingest.process_batch(_mk(spark, B1), epoch=0)
    docs = ingest.docs(spark)
    assert sorted(r.doc_id for r in docs.collect()) == [0, 1]  # 2 in-batch dup

    ingest.process_batch(_mk(spark, B2), epoch=1)
    docs = {r.doc_id for r in ingest.docs(spark).collect()}
    assert docs == {0, 1, 12}  # 10 exact-, 11 near-matched corpus 0

    rej = {r.doc_id: r for r in ingest.rejects(spark).collect()}
    assert set(rej) == {10, 11}
    assert rej[10].match_type == "exact" and rej[10].match_id == 0
    assert rej[11].match_type == "near" and rej[11].match_id == 0
    assert 0.4 <= rej[11].jaccard_est <= 1.0


def test_epoch_replay_is_idempotent(spark, ingest):
    ingest.process_batch(_mk(spark, B1), epoch=0)
    ingest.process_batch(_mk(spark, B2), epoch=1)
    n_before = ingest.docs(spark).count()
    rej_before = sorted(
        (r.doc_id, r.match_id, r.match_type)
        for r in ingest.rejects(spark).collect()
    )
    # a crash-replay of epoch 1 (its own rows already in the index from
    # the first attempt) must converge to the identical state: same
    # docs, same rejects — in particular NO self-matches of the
    # replayed rows against their own first-attempt index entries
    ingest.process_batch(_mk(spark, B2), epoch=1)
    assert ingest.docs(spark).count() == n_before
    assert ingest.docs(spark).where(F.col("doc_id") == 12).count() == 1
    rej_after = sorted(
        (r.doc_id, r.match_id, r.match_type)
        for r in ingest.rejects(spark).collect()
    )
    assert rej_after == rej_before
    assert all(d != m for d, m, _ in rej_after)


def test_replay_keeps_in_batch_near_dups(spark, ingest):
    """A batch holding two near-duplicate NOVEL docs (within-batch near
    dedup is out of scope — both are clean) must survive a crash-replay
    of its own epoch: without the running-epoch exclusion each doc
    near-matches the OTHER's first-attempt index entry and both are
    dropped from the corpus."""
    ingest.process_batch(_mk(spark, B1), epoch=0)
    near_pair = [
        (30, "watermark semantics for stateful stream operators in micro batch engines"),
        (31, "watermark semantics for stateful stream operators in tiny batch engines"),
    ]
    ingest.process_batch(_mk(spark, near_pair), epoch=1)
    docs1 = {r.doc_id for r in ingest.docs(spark).collect()}
    assert {30, 31} <= docs1  # both novel vs corpus, both kept
    # crash-replay of epoch 1: index/postings already hold 30 and 31
    ingest.process_batch(_mk(spark, near_pair), epoch=1)
    docs2 = {r.doc_id for r in ingest.docs(spark).collect()}
    assert docs2 == docs1
    rej = ingest.rejects(spark)
    assert rej is None or not {r.doc_id for r in rej.collect()} & {30, 31}


def test_blank_docs_exact_dedup_only(spark, ingest):
    ingest.process_batch(_mk(spark, [(0, ""), (1, "")]), epoch=0)
    assert [r.doc_id for r in ingest.docs(spark).collect()] == [0]
    ingest.process_batch(_mk(spark, [(2, "")]), epoch=1)
    rej = ingest.rejects(spark).collect()
    assert len(rej) == 1 and rej[0].match_type == "exact"


def test_live_stream_smoke(spark, tmp_path):
    # rate source → synthetic texts where every other row repeats a
    # template: the accumulated corpus must hold one doc per template
    ingest = CorpusDeltaDedup(str(tmp_path / "c2"))
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.concat(
                F.lit("synthetic streaming document body variant number "),
                (F.col("value") % 5).cast("string"),
                F.lit(" with enough words to shingle at three grams comfortably"),
            ).alias("text"),
        )
    )
    q = (
        ingest.attach(stream)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            d = ingest.docs(spark)
            if d is not None and d.count() >= 5:
                break
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(30)
    docs = ingest.docs(spark).collect()
    texts = [r.text for r in docs]
    assert len(texts) == len(set(texts))  # no duplicate content survived
    assert len(texts) >= 5 or len(set(texts)) == 5
