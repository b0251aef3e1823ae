"""BPE tokenizer training — correctness pinned without a SQL oracle:
textbook fixture, independent reference implementation, determinism,
and train/encode consistency."""

import numpy as np
import pytest

from vearch_spark.operators.bpe import END, BPEModel, _learn_merges, train_bpe


def test_textbook_merges():
    """Sennrich et al.'s worked example: corpus {low:5, lower:2,
    newest:6, widest:3}. The 'est'/'low' pair family ties at freq 9
    and 7; this trainer breaks ties by lexicographic max (documented,
    deterministic), so the exact merge ORDER differs from the paper
    while the learned segmentation is the classic one: the unseen
    word 'lowest' tokenizes as low + est</w>."""
    words = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = _learn_merges(words, 5, min_freq=1)
    # freq-9 family first (t</w> -> st</w> -> est</w>), then freq-7
    assert merges[0] == ("t", END)
    assert merges[1] == ("s", "t" + END)
    assert merges[2] == ("e", "st" + END)
    assert merges[3] == ("o", "w")
    assert merges[4] == ("l", "ow")
    model = BPEModel(merges)
    assert model.encode_word("lowest") == ["low", "est" + END]
    assert model.encode_word("newest") == ["n", "e", "w", "est" + END]
    assert model.encode_word("low") == ["low", END]


def _reference_pair_counts(seqs, freqs):
    pc = {}
    for seq, f in zip(seqs, freqs):
        for p in zip(seq, seq[1:]):
            pc[p] = pc.get(p, 0) + f
    return pc


def test_incremental_counts_match_recount():
    """The trainer's incremental pair-count maintenance must agree
    with a full recount after every merge — the reference is a naive
    reimplementation inside the test."""
    rng = np.random.default_rng(0)
    alphabet = list("abcdef")
    words = []
    for i in range(60):
        w = "".join(rng.choice(alphabet, size=rng.integers(1, 8)))
        words.append((w, int(rng.integers(1, 50))))
    # learn with the real trainer, then REPLAY merges naively and
    # compare the final segmentations
    merges = _learn_merges(words, 30, min_freq=1)
    model = BPEModel(merges)

    seqs = {w: tuple(w) + (END,) for w, _ in words}
    for a, b in merges:
        for w, seq in seqs.items():
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[w] = tuple(out)
    for w, _ in words:
        assert model.encode_word(w) == list(seqs[w]), w


def test_heap_selection_matches_max_scan():
    """r9: best-pair selection moved from an O(|pairs|) max scan per
    merge to a lazy-deletion heap. The learned merges must be
    IDENTICAL to the scan form — same (freq, pair) max with the
    lexicographic tie-break — on random corpora."""
    import numpy as np

    def learn_scan(words, num_merges, min_freq):
        seqs = [tuple(w) + (END,) for w, _ in words]
        freqs = [f for _, f in words]
        pc, where = {}, {}
        for i, seq in enumerate(seqs):
            f = freqs[i]
            for p in zip(seq, seq[1:]):
                pc[p] = pc.get(p, 0) + f
                where.setdefault(p, set()).add(i)
        merges = []
        for _ in range(num_merges):
            if not pc:
                break
            best = max(pc.items(), key=lambda kv: (kv[1], kv[0]))[0]
            if pc[best] < min_freq:
                break
            merges.append(best)
            joined = best[0] + best[1]
            for i in list(where.get(best, ())):
                seq, f = seqs[i], freqs[i]
                out, j = [], 0
                while j < len(seq):
                    if (
                        j + 1 < len(seq)
                        and seq[j] == best[0]
                        and seq[j + 1] == best[1]
                    ):
                        out.append(joined)
                        j += 2
                    else:
                        out.append(seq[j])
                        j += 1
                new = tuple(out)
                for p in zip(seq, seq[1:]):
                    pc[p] -= f
                    if pc[p] <= 0:
                        pc.pop(p, None)
                    s = where.get(p)
                    if s is not None:
                        s.discard(i)
                for p in zip(new, new[1:]):
                    pc[p] = pc.get(p, 0) + f
                    where.setdefault(p, set()).add(i)
                seqs[i] = new
        return merges

    rng = np.random.default_rng(3)
    for trial in range(5):
        words = {}
        for _ in range(800):
            w = "".join(rng.choice(list("abcdefgh"), size=rng.integers(1, 9)))
            words[w] = words.get(w, 0) + int(rng.integers(1, 40))
        wl = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))
        for nm, mf in ((40, 1), (300, 2)):
            assert _learn_merges(list(wl), nm, mf) == learn_scan(
                list(wl), nm, mf
            ), (trial, nm, mf)


def test_greedy_encoder_rank_order():
    """Encoding applies merges lowest-rank-first (GPT-2 bpe), not
    left-to-right: with ranks {(b,c):0, (a,b):1} the word 'abc'
    must become ['a','bc</w>'-ish], never ['ab','c...']."""
    model = BPEModel([("b", "c"), ("a", "b")])
    got = model.encode_word("abc")
    assert got[0] == "a" and got[1].startswith("bc")


def test_train_encode_consistency_and_determinism(spark):
    """Distributed training is layout-independent, and encoding the
    training corpus uses exactly the learned merges (every produced
    multi-char token is in the model vocab)."""
    rows = [
        (i, " ".join(["lower lowest newest widest low wide new"] * 2))
        for i in range(50)
    ] + [(100 + i, f"variant token{i % 7} stream") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m1 = train_bpe(df, num_merges=40, min_freq=1)
    m2 = train_bpe(df.repartition(13), num_merges=40, min_freq=1)
    assert m1.merges == m2.merges  # layout-independent
    vocab = m1.vocab()
    toks = m1.encode("lowest newest token3")
    # every token is a merge product, a raw character, or the bare
    # end-of-word marker — nothing the model didn't learn
    assert all(t in vocab or len(t) == 1 or t == END for t in toks)
    # the distributed encoder agrees with the driver-side encoder
    out = df.select(
        "doc_id", m1.encode_udf()(df["text"]).alias("toks")
    ).orderBy("doc_id").collect()
    assert out[0].toks == m1.encode(rows[0][1])
    counted = df.select(
        m1.token_count_udf()(df["text"]).alias("n")
    ).collect()
    assert counted[0].n == len(m1.encode(rows[0][1]))


def test_train_bpe_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(df, num_merges=0)
    # min_freq prunes: a corpus of singletons learns nothing at 2
    m = train_bpe(df, num_merges=5, min_freq=2)
    assert m.merges == []
