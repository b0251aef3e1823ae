"""sf1 spot-bench: per-family scaling exponents (VERDICT r4 ask #7).

The driver benches at sf0.1; an operator that is accidentally
super-linear would only surface there once it is already slow. This
harness synthesizes an sf1-shaped corpus (10x sf0.1) by replicating
the driver's documents/embeddings tables with salted ids, perturbed
texts (a replica token keeps exact-dup structure realistic instead of
collapsing clones), and noise-jittered vectors -- then times the
dedup/knn/text headline `queries()` entries at both scales and prints
the ratio per query. A healthy (at-worst-linear) operator lands
<= ~12x; anything above flags super-linear behavior long before the
100 TB deployment would find it.

    python tools/spot_sf1.py            # all families
    python tools/spot_sf1.py minhash_dedup cosine_near_dup

Writes the scaled tables under /tmp/vearch_spark_sf1 (reused across
runs) and prints one JSON line:
  {"sf01": {q: sec}, "sf1": {q: sec}, "ratio": {q: r}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/vearch_spark_sf1")
REPLICAS = 10

#: headline queries per family (documents/embeddings-backed only --
#: the TPC-H-ish tables are not part of the dedup/knn scale posture)
FAMILIES = [
    "exact_dedup",
    "minhash_dedup",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "dedup_clusters",
    "cosine_near_dup",
    "knn_self_join",
    "lang_id",
    "corpus_pipeline",
    "flat_knn_l2",
    "ivfflat_knn",
    # r6 (VERDICT r5 ask #5): the remaining headline families
    "event_sessions",  # events table — replicated with disjoint users
    "bm25_topk",
    "hybrid_rrf",
    "tfidf_keywords",
    "embedding_outliers",
    "lm_perplexity",
    "multimodal_features",  # fixed 200-doc slice by design: expect ~1x
    "sequence_packing",
    # r7: the new corpus-scaling pipeline ops (gif/video_frame_sample
    # are fixed-slice by design like multimodal_features — their scale
    # evidence is tools/stress_media.py throughput instead)
    "html_extract",
    "domain_cap",
    "cosine_near_dup_bucketed",
    "corpus_line_filter",
    # r9: corpus-scaling additions (audio_segments / media_probe are
    # fixed-slice by design — stress_media.py covers their codecs)
    "containment_pairs",
    "url_dedup",
]


def build_sf1(spark) -> None:
    """10x replication with a SCALE-INVARIANT duplicate profile.

    The naive 10x (append a replica token) makes every doc 9 near-dups
    of its clones, inflating true near-dup density 10x -- the measured
    "superlinearity" was then mostly legitimate output growth, not
    plan behavior. Instead each replica applies a uniform per-replica
    transform that (a) preserves ALL pair structure WITHIN the replica
    (two near-dups stay near-dups) and (b) makes cross-replica pairs
    non-duplicates:

    - text: every word is prefixed with an r{k}q salt -- shingle sets
      and simhash token sets within a replica transform identically,
      across replicas they are disjoint;
    - embeddings: a per-replica deterministic sign reflection (an
      orthogonal transform): norms, L2 distances, and cosines within
      the replica are EXACTLY preserved; cross-replica cosines land at
      chance.
    """
    from pyspark.sql import functions as F

    done = os.path.join(SF1_DIR, "_DONE_v3")  # v3: + events table
    if os.path.exists(done):
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    n_docs = docs.count()
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n_docs * 10)
        .withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(^|\s)"),
                    F.concat(F.lit("$1r"), F.col("rep").cast("string"), F.lit("q")),
                )
            ),
        )
        .drop("rep")
        .withColumn("n_chars", F.length("text").cast("long"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SF1_DIR}/documents.parquet")
    )
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n_emb = emb.count()
    (
        emb.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * n_emb * 10)
        .withColumn(
            "embedding",
            F.when(F.col("rep") == 0, F.col("embedding")).otherwise(
                F.transform(
                    "embedding",
                    lambda v, i: F.when(
                        F.pmod(F.xxhash64(i, F.col("rep")), F.lit(2)) == 1, -v
                    ).otherwise(v).cast("float"),
                )
            ),
        )
        .drop("rep")
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{SF1_DIR}/embeddings.parquet")
    )
    # events: per-replica DISJOINT users (salted user_id) with
    # timestamps untouched — every user's session structure transforms
    # identically, so sessions/user and events/session are
    # scale-invariant while total rows grow 10x
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    n_ev = ev.count()
    n_users = ev.select("user_id").distinct().count()
    (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * n_ev * 10)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * n_users * 10)
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SF1_DIR}/events.parquet")
    )
    with open(done, "w") as fh:
        fh.write("ok")


def main() -> None:
    import __spark_entry__ as entry
    from vearch_spark.session import get_spark

    only = set(sys.argv[1:])
    names = [q for q in FAMILIES if not only or q in only]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="spot-sf1", master=f"local[{cpus}]")
    build_sf1(spark)
    queries = entry.queries()
    out = {"sf01": {}, "sf1": {}, "ratio": {}}
    for name in names:
        fn = queries[name]
        for key, d in (("sf01", SF01), ("sf1", SF1_DIR)):
            t0 = time.time()
            fn(spark, d).collect()
            out[key][name] = round(time.time() - t0, 2)
        r = out["sf1"][name] / max(out["sf01"][name], 0.01)
        out["ratio"][name] = round(r, 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
