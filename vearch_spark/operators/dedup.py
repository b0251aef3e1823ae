"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): exact and
near-duplicate detection over a document corpus, each expressed as
shuffle-lean DataFrame plans that hold at 100 TB:

- **exact**: hash-groupBy on a content fingerprint — one shuffle on the
  fingerprint, map-side partial aggregation;
- **MinHash + LSH**: shingle → 128-way minhash signature (one JVM-side
  nested ``transform``/``array_min`` expression, no Python) → banded
  bucket keys → explode + self-join *within buckets only* → exact
  Jaccard verification on the candidates. The only wide op is the
  bucket join, whose fan-in is bounded by band width;
- **SimHash**: per-token bit votes folded into a 64-bit signature,
  near-dup = identical signature band (Hamming via bit_count);
- **n-gram Jaccard**: inverted-index join (explode shingles, join on
  shingle, count co-occurrences) — the classic exact pair join that
  avoids the O(n²) cross product;
- **embedding cosine**: brute top-pairs for correctness, plus a
  cluster-bucketed variant (reuse the IVF coarse quantizer) as the
  scale path.

All hashing uses Spark's built-in ``xxhash64`` (JVM, whole-stage
codegen); nothing here drops into Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM-side)."""
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(col, " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def exact_dedup(
    df: DataFrame,
    key: Column | list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup: one row per distinct ``key``, keeping the smallest
    id (deterministic). Returns (keeper id, group size)."""
    k = key if isinstance(key, Column) else F.concat_ws("\x01", *[F.col(c) for c in key])
    return (
        df.withColumn("_fp", k)
        .groupBy("_fp")
        .agg(F.min(id_col).alias("keeper_" + id_col), F.count("*").alias("n_dups"))
    )


def minhash_signature(shingles: Column, num_hashes: int = 128) -> Column:
    """128-way minhash signature as one nested JVM expression.

    Each shingle string is hashed ONCE (xxhash64); the per-permutation
    value rehashes that fixed-width long (xxhash64(i, h)) instead of
    re-hashing the string 128×, cutting signature cost ~|shingle|-fold.
    sig[i] = min over shingles of xxhash64(i, xxhash64(shingle)).
    """
    base = F.transform(shingles, lambda sh: F.xxhash64(sh))
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(base, lambda h: F.xxhash64(i, h))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH with exact verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥
    threshold. Candidates are generated only inside LSH buckets (band
    hash collisions), so the join never goes O(n²); the verify step
    recomputes exact Jaccard on the shingle sets of candidates only.
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("_did"),
        word_shingles(text_col, shingle_n).alias("_sh"),
    ).where(F.size("_sh") > 0)
    sig = base.withColumn("_sig", minhash_signature(F.col("_sh"), num_hashes))

    banded = sig.select(
        "_did",
        "_sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band)).alias(
                        "bh"
                    ),
                ),
            )
        ).alias("_band"),
    ).select("_did", "_sh", F.col("_band.band").alias("_b"), F.col("_band.bh").alias("_bh"))

    left = banded.select(
        F.col("_b"), F.col("_bh"), F.col("_did").alias("id_a"), F.col("_sh").alias("_sh_a")
    )
    right = banded.select(
        F.col("_b"), F.col("_bh"), F.col("_did").alias("id_b"), F.col("_sh").alias("_sh_b")
    )
    cands = (
        left.join(right, on=["_b", "_bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sh_a", "_sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size("_sh_a") + F.size("_sh_b") - inter
    out = cands.withColumn("jaccard", inter / union).where(
        F.col("jaccard") >= jaccard_threshold
    )
    return out.select("id_a", "id_b", "jaccard")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join via inverted index.

    explode(shingle) → join on shingle → count co-occurring shingles
    per pair → jaccard = |∩| / (|A|+|B|−|∩|). The shuffle key is the
    shingle, so common-shingle skew is the scale hazard — mitigated by
    dropping ubiquitous shingles (document frequency cap) the same way
    production near-dup pipelines do.
    """
    base = df.select(
        F.col(id_col).alias("_did"), word_shingles(text_col, shingle_n).alias("_sh")
    ).where(F.size("_sh") > 0)
    sizes = base.select("_did", F.size("_sh").alias("_n"))
    posts = base.select("_did", F.explode("_sh").alias("_shingle"))

    # document-frequency cap: a shingle in >1% of docs (min 100) carries
    # no dedup signal but quadratic join cost
    n_docs = base.count()
    df_cap = max(100, int(n_docs * 0.01))
    hot = (
        posts.groupBy("_shingle")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") > df_cap)
        .select("_shingle")
    )
    posts = posts.join(F.broadcast(hot), on="_shingle", how="left_anti")

    pairs = (
        posts.alias("a")
        .join(posts.alias("b"), on="_shingle")
        .where(F.col("a._did") < F.col("b._did"))
        .groupBy(F.col("a._did").alias("id_a"), F.col("b._did").alias("id_b"))
        .agg(F.count("*").alias("_inter"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("_did", "id_a").withColumnRenamed("_n", "_na"), "id_a")
        .join(sizes.withColumnRenamed("_did", "id_b").withColumnRenamed("_n", "_nb"), "id_b")
        .withColumn("jaccard", F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")))
        .where(F.col("jaccard") >= jaccard_threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


def simhash64(text: Column | str) -> Column:
    """64-bit SimHash of whitespace tokens, fully JVM-side.

    bit i of the signature = sign of Σ_tokens (±1 by bit i of
    xxhash64(token)); packed into a long. Bit masks are Python-side
    literals (bit 63 as the signed long MIN) so every op stays a static
    Catalyst expression.
    """
    col = F.col(text) if isinstance(text, str) else text
    hashes = F.transform(F.split(col, " "), lambda t: F.xxhash64(t))

    def _vote(mask: int):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, 1
        ).otherwise(-1)

    sig = F.lit(0).cast("long")
    for i in range(64):
        mask = (1 << i) if i < 63 else -(1 << 63)
        vote = F.aggregate(hashes, F.lit(0), _vote(mask))
        sig = sig.bitwiseOR(
            F.when(vote > 0, F.lit(mask).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return sig


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split 64 bits into ``bands`` blocks; any pair
    within Hamming ≤ bands−1 shares at least one identical block, so
    the candidate join keys on (band, block value). Exact Hamming via
    bit_count(xor) verifies candidates.
    """
    width = 64 // bands
    sh = df.select(F.col(id_col).alias("_did"), simhash64(text_col).alias("_sim"))
    mask = F.lit((1 << width) - 1).cast("long")
    blocks = sh.select(
        "_did",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("_sim"), b * width).bitwiseAND(mask).alias("blk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_blk"),
    ).select("_did", "_sim", F.col("_blk.band").alias("_b"), F.col("_blk.blk").alias("_v"))

    a = blocks.select("_b", "_v", F.col("_did").alias("id_a"), F.col("_sim").alias("_sim_a"))
    b = blocks.select("_b", "_v", F.col("_did").alias("id_b"), F.col("_sim").alias("_sim_b"))
    cands = (
        a.join(b, on=["_b", "_v"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("_sim_a").bitwiseXOR(F.col("_sim_b")))
    return (
        cands.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    bucket_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Brute form is the O(n²/2) self-join — correct at any n, viable to
    ~10⁵ rows per executor-batch. For 100 TB, pass ``bucket_col`` (e.g.
    the IVF ``_cluster_id``) to restrict the join to same-bucket pairs:
    near-dups land in the same coarse cell with high probability, which
    is the standard SNN/blocking trade-off.
    """
    from vearch_spark.functions.distance import inner_product, vector_norm

    keep = [id_col, vec_col] + ([bucket_col] if bucket_col else [])
    # norms are computed ONCE per row (narrow pass), not per pair — the
    # pair join then does a single dot-product fold
    base = df.select(*keep).withColumn(
        "_v", F.col(vec_col).cast("array<double>")
    )
    base = base.withColumn("_n", vector_norm(F.col("_v"))).drop(vec_col)
    a = base.select(
        *([F.col(bucket_col)] if bucket_col else []),
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = base.select(
        *([F.col(bucket_col)] if bucket_col else []),
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    joined = a.join(b, on=bucket_col) if bucket_col else a.crossJoin(b)
    out = (
        joined.where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.try_divide(
                inner_product(F.col("_va"), F.col("_vb")),
                F.col("_na") * F.col("_nb"),
            ),
        )
        .where(F.col("cosine") >= threshold)
    )
    return out.select("id_a", "id_b", "cosine")
