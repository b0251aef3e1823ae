"""Byte-pair-encoding tokenizer training and encoding, Spark-first.

Training a BPE tokenizer is a standard stage of a training-data
pipeline (the tokenizer is fit on the corpus the model will see).
The scale split follows how production trainers actually work:

- The CORPUS pass is distributed: pre-tokenize every document with
  the same regex the encoder uses and aggregate word frequencies —
  one map-side-combined shuffle on the word, the only corpus-sized
  job (at 100 TB this is the dominant cost and it is a single agg).
- Merge LEARNING runs on the bounded word-frequency summary
  (``max_words`` most frequent words — the standard practice: the
  top ~1M word forms carry ~99.9% of token mass, and the summary is
  KB-to-MB scale regardless of corpus size), driver-side with
  incremental pair-count maintenance, deterministic tie-breaks.
- ENCODING is an Arrow-batched pandas UDF with the merge ranks riding
  the closure (broadcast-sized), classic greedy lowest-rank merging
  with an LRU word cache — no shuffle, no join, linear.

No SQL oracle can train BPE, so the driver query built on this is
rows-only; correctness is pinned by tests instead: the textbook
fixture (Sennrich et al.'s "low/lower/newest/widest" example), an
independent in-test reference implementation, determinism across
partitionings, and train/encode consistency (encoding the training
corpus reproduces the learned vocabulary exactly).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from vearch_spark.functions.text import BPE_TOKEN_PATTERN

END = "</w>"  # end-of-word marker (Sennrich et al. 2016)


def word_counts(
    df: DataFrame, text_col: str = "text", lowercase: bool = False
) -> DataFrame:
    """Distributed word-frequency table: pre-tokenize with the SAME
    regex the encoder uses (functions/text.py BPE_TOKEN_PATTERN) and
    aggregate — ONE shuffle on the word, partial aggregation
    collapsing repeats map-side. Columns: word, freq."""
    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(col, F.lit(BPE_TOKEN_PATTERN), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


class _RevStr(str):
    """str with inverted ordering. heapq is a min-heap; the merge rule
    wants the lexicographically LARGEST pair among equal-frequency
    ties, so pair components enter the heap wrapped in this."""

    __slots__ = ()

    def __lt__(self, other):  # type: ignore[override]
        return str.__gt__(self, other)


def _learn_merges(
    words: list[tuple[str, int]], num_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning with incremental pair-count updates.
    Deterministic: the best pair is max by (freq, pair) — lexicographic
    tie-break, so the learned merges are a pure function of the
    word-frequency table.

    Best-pair selection is a lazy-deletion heap (r9): every count
    change pushes a (freq, pair) entry; stale entries (count no longer
    current) are discarded on pop. Per merge that's O(touched-pairs ·
    log heap) instead of a full O(|pairs|) max scan — the term that
    went superlinear at a production 32k-merge vocabulary."""
    import heapq

    seqs = [tuple(w) + (END,) for w, _ in words]
    freqs = [f for _, f in words]
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, seq in enumerate(seqs):
        f = freqs[i]
        for a, b in zip(seq, seq[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
            where.setdefault((a, b), set()).add(i)
    heap = [
        (-c, _RevStr(a), _RevStr(b)) for (a, b), c in pair_counts.items()
    ]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negc, ra, rb = heap[0]
            pair = (str(ra), str(rb))
            if pair_counts.get(pair, 0) == -negc:
                best = pair
                break
            heapq.heappop(heap)  # stale: count changed since push
        if best is None or pair_counts[best] < min_freq:
            break
        heapq.heappop(heap)
        merges.append(best)
        joined = best[0] + best[1]
        touched: dict[tuple[str, str], int] = {}
        for i in list(where.get(best, ())):
            seq, f = seqs[i], freqs[i]
            out = []
            j = 0
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
            # decrement old pair counts, increment new — only for the
            # touched word, so each merge costs O(words containing it)
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] -= f
                touched[(a, b)] = pair_counts[(a, b)]
                if pair_counts[(a, b)] <= 0:
                    pair_counts.pop((a, b), None)
                s = where.get((a, b))
                if s is not None:
                    s.discard(i)
            for a, b in zip(new, new[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
                touched[(a, b)] = pair_counts[(a, b)]
                where.setdefault((a, b), set()).add(i)
            seqs[i] = new
        for (a, b), c in touched.items():
            if c > 0:
                heapq.heappush(heap, (-c, _RevStr(a), _RevStr(b)))
    return merges


class BPEModel:
    """Learned merges + greedy encoder (GPT-2-style lowest-rank-first
    merging). Picklable; the ranks dict rides UDF closures to
    executors once."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = list(merges)
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}

    def encode_word(self, word: str) -> list[str]:
        seq = list(word) + [END]
        while len(seq) > 1:
            best_rank, best_at = None, -1
            for j, pair in enumerate(zip(seq, seq[1:])):
                r = self.ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_at = r, j
            if best_rank is None:
                break
            seq[best_at : best_at + 2] = [seq[best_at] + seq[best_at + 1]]
        return seq

    def encode(self, text: str, lowercase: bool = False) -> list[str]:
        import re

        if lowercase:
            text = text.lower()
        out: list[str] = []
        cache: dict[str, list[str]] = {}
        for w in re.findall(BPE_TOKEN_PATTERN, text):
            got = cache.get(w)
            if got is None:
                got = cache[w] = self.encode_word(w)
            out.extend(got)
        return out

    def vocab(self) -> set[str]:
        """All symbols the merges can produce (chars excluded — they
        depend on the corpus)."""
        return {a + b for a, b in self.merges}

    def encode_udf(self, lowercase: bool = False):
        """Arrow-batched column encoder: text -> array<string> tokens.
        One python worker keeps a per-batch word cache — real corpora
        repeat words heavily, so the greedy merge runs once per
        distinct word per batch."""
        from pyspark.sql.pandas.functions import pandas_udf

        model = self

        @pandas_udf("array<string>")
        def enc(texts: pd.Series) -> pd.Series:
            import re

            cache: dict[str, list[str]] = {}
            out = []
            for t in texts:
                t = (t or "")
                if lowercase:
                    t = t.lower()
                toks: list[str] = []
                for w in re.findall(BPE_TOKEN_PATTERN, t):
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = model.encode_word(w)
                    toks.extend(got)
                out.append(toks)
            return pd.Series(out)

        return enc

    def token_count_udf(self, lowercase: bool = False):
        from pyspark.sql.pandas.functions import pandas_udf

        model = self

        @pandas_udf("int")
        def cnt(texts: pd.Series) -> pd.Series:
            import re

            cache: dict[str, int] = {}
            out = []
            for t in texts:
                t = (t or "")
                if lowercase:
                    t = t.lower()
                n = 0
                for w in re.findall(BPE_TOKEN_PATTERN, t):
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = len(model.encode_word(w))
                    n += got
                out.append(n)
            return pd.Series(out)

        return cnt


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    max_words: int = 1_000_000,
    min_freq: int = 2,
    lowercase: bool = False,
) -> BPEModel:
    """Fit a BPE tokenizer on a corpus: distributed word count (one
    shuffle — the only corpus-sized job), bounded top-``max_words``
    summary to the driver (deterministic order: freq desc, word asc),
    then incremental merge learning. Deterministic end-to-end."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    wc = word_counts(df, text_col, lowercase=lowercase)
    rows = (
        wc.orderBy(F.col("freq").desc(), F.col("word"))
        .limit(int(max_words))
        .collect()
    )
    words = [(r["word"], int(r["freq"])) for r in rows]
    return BPEModel(_learn_merges(words, num_merges, min_freq))
