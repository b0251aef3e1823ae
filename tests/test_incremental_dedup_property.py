"""Property test: dedup_against_corpus vs a python brute-force twin on
random word corpora (SURVEY §5 model — the reference fuzzes engine
paths with random inputs in CI).

LSH is probabilistic near its threshold: with 128 hashes / 32 bands of
4, a pair at jaccard j collides in some band with P = 1−(1−j⁴)³²
(≈0.87 at j=0.5, ≈0.9998 at j=0.7). The properties are therefore:

- precision is EXACT: every emitted match is a true match — correct
  type, correct pair jaccard (integer-ratio arithmetic), ≥ threshold;
- exact-duplicate recall is EXACT: the fingerprint arm has no LSH in
  it, so every verbatim re-crawl must be matched 'exact' to the lowest
  matching corpus id;
- near recall is asserted only where the banding is near-certain
  (best true jaccard ≥ 0.7 — planted dups mutate 1 token of 20, j≈0.85).
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vearch_spark.operators.dedup import dedup_against_corpus

VOCAB = [f"w{i}" for i in range(40)]
N_CORPUS, N_NEW, DOC_LEN = 12, 8, 20
THR = 0.5


def _mk_docs(rng, n, start_id, dup_from=None):
    rows = []
    for i in range(n):
        if dup_from is not None and i % 3 == 0:
            toks = list(dup_from[rng.integers(0, len(dup_from))][1].split(" "))
            if rng.random() < 0.5:
                toks[rng.integers(0, len(toks))] = VOCAB[rng.integers(0, len(VOCAB))]
        else:
            toks = [VOCAB[j] for j in rng.integers(0, len(VOCAB), DOC_LEN)]
        rows.append((start_id + i, " ".join(toks)))
    return rows


def _shingles(text, n=3):
    toks = [t for t in text.split(" ") if t]
    if not toks:
        return set()
    hi = max(len(toks) - n, 0)
    return {" ".join(toks[i : i + n]) for i in range(hi + 1)}


def _jac(a, b):
    sa, sb = _shingles(a), _shingles(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 2**16))
def test_matches_brute_force(spark, seed):
    rng = np.random.default_rng(seed)
    corpus_rows = _mk_docs(rng, N_CORPUS, 0)
    new_rows = _mk_docs(rng, N_NEW, 1000, dup_from=corpus_rows)
    c = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    n = spark.createDataFrame(new_rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.match_type, r.jaccard, r.match_id)
        for r in dedup_against_corpus(n, c, jaccard_threshold=THR).collect()
    }
    ctext = dict(corpus_rows)
    ntext = dict(new_rows)

    # precision: every emitted match is a real one with the true jaccard
    for nid, (mt, j, mid) in got.items():
        if mt == "exact":
            assert ntext[nid] == ctext[mid]
            assert j == 1.0
            # lowest-id exact twin wins (exact outranks near everywhere)
            assert mid == min(
                cid for cid, tx in corpus_rows if tx == ntext[nid]
            )
        else:
            true_j = _jac(ntext[nid], ctext[mid])
            assert j == pytest.approx(true_j, abs=1e-9)
            assert true_j >= THR
            # no exact twin existed, else priority was violated
            assert all(tx != ntext[nid] for _, tx in corpus_rows)

    # exact recall: the fingerprint arm is deterministic
    for nid, tx in new_rows:
        twins = [cid for cid, ctx in corpus_rows if ctx == tx]
        if twins:
            assert got.get(nid, (None,))[0] == "exact"

    # near recall where banding is near-certain
    for nid, tx in new_rows:
        if nid in got:
            continue
        best = max((_jac(tx, ctx) for _, ctx in corpus_rows), default=0.0)
        assert best < 0.7, (nid, best)
