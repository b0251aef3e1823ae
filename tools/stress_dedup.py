"""Scale stress: near-dup dedup over N synthetic documents on local[32].

The driver's documents table tops out at 5k rows — too small to see the
dedup operators' scaling shape. This harness generates N documents
DISTRIBUTEDLY (deterministic per-id token sampling from a fixed
vocabulary; ~5% are planted near-duplicates of a base doc with light
token noise), then measures:

- MinHash-LSH pair detection (signature → bands → bucket join → exact
  verify) — docs/s end-to-end;
- exact dedup (md5 groupBy) — docs/s;
- resolution (connected components + canonical pick) on the pair set.

The numbers back SCALE.md's "dedup never goes O(n²)" claims with
measured throughput at two orders of magnitude above test SF.

Usage: python tools/stress_dedup.py [N] [blocks]
``blocks`` is an optional comma-list restricting which measurement
blocks run (minhash, exact, span, removal, incremental, stream);
default all. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

VOCAB = 5000
DOC_LEN = 60
DUP_EVERY = 20  # every 20th doc is a near-dup of the previous base doc


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    blocks = (
        set(sys.argv[2].split(","))
        if len(sys.argv) > 2
        else {"minhash", "exact", "span", "removal", "incremental", "stream"}
    )
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    from vearch_spark.operators.dedup import (
        dedup_resolve,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from vearch_spark.session import get_spark

    spark = get_spark(app_name="dedup-stress")

    @pandas_udf("string")
    def synth_text(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            base = int(i) - (int(i) % DUP_EVERY != 0)  # dup rows copy base-1
            rng = np.random.default_rng(base if int(i) % DUP_EVERY else int(i))
            toks = rng.integers(0, VOCAB, size=DOC_LEN)
            if int(i) % DUP_EVERY:  # mutate ~5% of tokens for the dup
                flip = np.random.default_rng(int(i)).integers(0, DOC_LEN, size=3)
                toks = toks.copy()
                toks[flip] = np.random.default_rng(int(i) + 1).integers(
                    0, VOCAB, size=3
                )
            out.append(" ".join(f"w{t}" for t in toks))
        return pd.Series(out)

    docs = (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .repartition(32)
        .withColumn("text", synth_text("doc_id"))
        .persist()
    )
    docs.count()  # materialize generation outside the timed region

    out: dict[str, float] = {"n_docs": n}

    if "minhash" in blocks:
        t0 = time.time()
        pairs = minhash_lsh_pairs(
            docs, text_col="text", id_col="doc_id",
            num_hashes=128, bands=32, shingle_n=3, jaccard_threshold=0.5,
        ).persist()
        n_pairs = pairs.count()
        dt = time.time() - t0
        out["minhash_pairs"] = n_pairs
        out["minhash_docs_per_s"] = round(n / dt, 1)

        t0 = time.time()
        resolved = dedup_resolve(docs, pairs, id_col="doc_id")
        kept = resolved.where(F.col("is_canonical") == 1).count()
        out["resolve_s"] = round(time.time() - t0, 2)
        out["docs_kept"] = kept

    if "exact" in blocks:
        t0 = time.time()
        exact_dedup(docs, ["text"], id_col="doc_id").count()
        out["exact_dedup_docs_per_s"] = round(n / (time.time() - t0), 1)

    from vearch_spark.operators.dedup import duplicated_span_stats

    if "span" in blocks:
        t0 = time.time()
        agg = (
            duplicated_span_stats(docs, window=20, id_col="doc_id")
            .agg(F.sum("n_spans").alias("s"), F.sum("n_dup_spans").alias("d"))
            .collect()[0]
        )
        out["span_docs_per_s"] = round(n / (time.time() - t0), 1)
        out["span_total"] = int(agg["s"])
        out["span_dup"] = int(agg["d"])

    if "removal" in blocks:
        # the acting half: excise every non-keeper duplicated span.
        # Cross-checked against the accounting op: a doc with zero dup
        # spans must lose zero tokens, and removed totals stay within
        # the dup-span token budget.
        from vearch_spark.operators.dedup import remove_duplicate_spans

        t0 = time.time()
        rem = remove_duplicate_spans(docs, window=20, id_col="doc_id")
        ragg = rem.agg(
            F.sum("n_removed").alias("r"),
            F.sum((F.col("n_removed") > 0).cast("int")).alias("cut"),
            F.sum("n_tokens").alias("t"),
        ).collect()[0]
        dt = time.time() - t0
        out["removal_docs_per_s"] = round(n / dt, 1)
        out["removal_tokens_removed"] = int(ragg["r"])
        out["removal_docs_cut"] = int(ragg["cut"])
        assert 0 < int(ragg["r"]) < int(ragg["t"]), "removal out of range"
        if "span" in blocks:
            stats = duplicated_span_stats(docs, window=20, id_col="doc_id")
            bad = (
                rem.join(stats, on="doc_id")
                .where((F.col("n_dup_spans") == 0) & (F.col("n_removed") > 0))
                .count()
            )
            assert bad == 0, f"{bad} docs cut without dup spans"

    # incremental form: a re-crawl shard (10% of the corpus re-presented
    # under new ids — even ids verbatim = exact, odd ids with a token
    # appended = near) matched against the full corpus. Throughput is
    # per TOTAL doc processed: the batch operator re-shingles both sides
    # (the streaming form, CorpusDeltaDedup, amortizes the corpus side
    # into a stored signature index instead).
    from vearch_spark.operators.dedup import dedup_against_corpus

    if "incremental" in blocks:
        n_new = n // 10
        recrawl = docs.where(F.col("doc_id") < n_new).select(
            (F.col("doc_id") + n).alias("doc_id"),
            F.when(
                F.col("doc_id") % 2 == 1, F.concat(F.col("text"), F.lit(" xz"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        t0 = time.time()
        matched = dedup_against_corpus(recrawl, docs, jaccard_threshold=0.5)
        by_type = {r["match_type"]: r["n"] for r in
                   matched.groupBy("match_type").agg(F.count("*").alias("n")).collect()}
        dt = time.time() - t0
        out["incremental_exact"] = by_type.get("exact", 0)
        out["incremental_near"] = by_type.get("near", 0)
        out["incremental_total_docs_per_s"] = round((n + n_new) / dt, 1)

    # streaming form: 5 sequential micro-batches through the durable
    # signature index (streaming/corpus.py). The evidence is per-batch
    # FLATNESS — batch cost must not grow with the accumulated corpus,
    # because matching reads the stored fingerprint/sig/posting
    # relations instead of re-shingling corpus text.
    if "stream" in blocks:
        import shutil
        import tempfile

        from vearch_spark.streaming.corpus import CorpusDeltaDedup

        d = tempfile.mkdtemp(prefix="corpus_stress_")
        ing = CorpusDeltaDedup(d + "/c", jaccard_threshold=0.5)
        bs = n // 10
        t_batches = []
        for e in range(5):
            b = docs.where(
                (F.col("doc_id") >= e * bs) & (F.col("doc_id") < (e + 1) * bs)
            ).select("doc_id", "text")
            t0 = time.time()
            ing.process_batch(b, e)
            t_batches.append(time.time() - t0)
        out["stream_batch_s"] = [round(t, 2) for t in t_batches]
        out["stream_docs_per_s"] = round(
            bs * len(t_batches) / sum(t_batches), 1
        )
        shutil.rmtree(d)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
