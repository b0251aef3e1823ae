"""Incremental (new-shard vs existing-corpus) dedup —
dedup.dedup_against_corpus. Crafted corpora pin: exact vs near
priority, cross-side-only matching, best-match tie-breaks, the clean
anti-join, blank docs, and the corpus-side bucket cap."""

import pytest
from pyspark.sql import functions as F

from vearch_spark.operators.dedup import dedup_against_corpus

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (1, "completely different content about spark query engines and distributed joins here"),
    (2, "completely different content about spark query engines and distributed joins here"),
    (3, "unrelated words apple banana cherry durian elderberry fig grape honeydew kiwi lemon"),
]
NEW = [
    # exact dup of corpus 1 AND 2 → best match = lowest corpus id, 'exact'
    (100, "completely different content about spark query engines and distributed joins here"),
    # near dup of corpus 0 (one word changed)
    (101, "the quick brown fox jumps over the lazy dog near the old river bank tonight"),
    # novel
    (102, "entirely novel musings on watermarking and stateful stream processing semantics"),
    # blank: no shingles, no exact twin → clean
    (103, ""),
    # within-new exact dup of 102 — must NOT match (cross-side only)
    (104, "entirely novel musings on watermarking and stateful stream processing semantics"),
]


@pytest.fixture(scope="module")
def sides(spark):
    c = spark.createDataFrame(CORPUS, "doc_id long, text string")
    n = spark.createDataFrame(NEW, "doc_id long, text string")
    return n, c


def test_matches_and_priority(spark, sides):
    n, c = sides
    out = {r.doc_id: r for r in dedup_against_corpus(n, c, jaccard_threshold=0.3).collect()}
    assert set(out) == {100, 101}
    assert out[100].match_type == "exact"
    assert out[100].match_id == 1  # lowest corpus id among the two exact twins
    assert out[100].jaccard == 1.0
    assert out[101].match_type == "near"
    assert out[101].match_id == 0
    assert 0.3 <= out[101].jaccard < 1.0


def test_clean_set_is_anti_join(spark, sides):
    n, c = sides
    matched = dedup_against_corpus(n, c, jaccard_threshold=0.3)
    clean = n.join(matched, "doc_id", "left_anti")
    assert sorted(r.doc_id for r in clean.collect()) == [102, 103, 104]


def test_exact_outranks_near_for_same_doc(spark):
    # a new doc that is an exact twin of corpus 10 and a near twin of
    # corpus 11 must report the exact match even though 11 < 10 is false
    # — flip ids so near would win the id tie-break if priority failed
    c = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (5, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        ],
        "doc_id long, text string",
    )
    n = spark.createDataFrame(
        [(200, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    out = dedup_against_corpus(n, c, jaccard_threshold=0.3).collect()
    assert len(out) == 1
    assert out[0].match_type == "exact" and out[0].match_id == 10


def test_corpus_bucket_cap_bounds_fanout(spark):
    # 50 identical corpus docs: with the cap at 3, each colliding new
    # doc verifies against at most 3 corpus rows yet still matches
    text = "boilerplate legal disclaimer repeated across every mirror of the crawl corpus"
    c = spark.createDataFrame([(i, text) for i in range(50)], "doc_id long, text string")
    n = spark.createDataFrame([(900, text + " x")], "doc_id long, text string")
    out = dedup_against_corpus(n, c, jaccard_threshold=0.3, max_bucket=3).collect()
    assert len(out) == 1 and out[0].match_id == 0


def test_md5_31_family_variant(spark, sides):
    # the oracle-reproducible hash family must find the same matches
    n, c = sides
    out = {
        r.doc_id: r.match_type
        for r in dedup_against_corpus(
            n, c, jaccard_threshold=0.3, shingle_hash="md5_31"
        ).collect()
    }
    assert out == {100: "exact", 101: "near"}


def test_id_equal_cross_match_excluded(spark):
    """Overlapping id spaces: a re-crawl resending the SAME doc_id with
    identical text is an update/replay (the streaming twin's
    `_did != match_id` contract), never a match that would anti-join
    the doc out of the clean set — on BOTH the exact and near arms."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),   # exact replay
         (2, "one two three four five six EIGHT"),     # near replay
         (9, "alpha beta gamma delta epsilon zeta")],  # true exact dup
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_against_corpus(
        new, corpus, jaccard_threshold=0.3).collect()}
    assert 1 not in out  # exact self-replay excluded
    assert 2 not in out  # near self-replay excluded
    assert out[9].match_id == 1 and out[9].match_type == "exact"
