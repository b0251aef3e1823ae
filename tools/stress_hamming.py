"""Scale sweep for the banded exact-Hamming pair kernel (hamming_pairs).

Uniform int64 hashes with one planted <=2-bit near-dup pair per 20 ids
(every id%20==19 flips <=2 bits of id-1's hash; chance hamming<=3
collisions among uniform 64-bit hashes are ~0 at these n, so the found
count should equal n/20 exactly). Maps the envelope SCALE.md documents:
exact all-pairs banding carries an intrinsic ~n^2/2^17 candidate term
(4 bands x 16-bit band space), fine to ~2M hashes per shard; pass a
max_bucket to measure the guard's linear chain mode instead.

Usage: python tools/stress_hamming.py [N] [max_bucket] [cross]
With "cross", measures one N x N hamming_pairs_cross pass instead (the
sharding path: per-pass candidates are |bucket_a| x |bucket_b| — the
decomposition bounds each pass's spill, total exact work is unchanged);
plants one <=2-bit cross pair per 20 corpus ids.
Prints one JSON line {"n", "max_bucket", "wall_s", "pairs"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from vearch_spark.operators.dedup import (
        hamming_pairs,
        release_skew_guard_caches,
    )
    from vearch_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mb = (
        int(sys.argv[2])
        if len(sys.argv) > 2 and sys.argv[2] != "none"
        else None
    )
    cross = len(sys.argv) > 3 and sys.argv[3] == "cross"
    spark = get_spark(app_name="hamming-scale")
    ids = spark.range(n).repartition(32)
    if cross:
        from vearch_spark.operators.dedup import hamming_pairs_cross

        corpus = ids.select(
            F.col("id").alias("doc_id"), F.xxhash64("id").alias("_h")
        )
        new = ids.select(
            (F.col("id") + n).alias("doc_id"),
            F.expr(
                "CASE WHEN id % 20 != 0 THEN xxhash64(id + 7777777777L) "
                "ELSE xxhash64(id) ^ (shiftleft(1L, int(id * 7 % 64)) | "
                "shiftleft(1L, int(id * 13 % 64))) END"
            ).alias("_h"),
        )
        t0 = time.time()
        found = hamming_pairs_cross(
            new, corpus, hash_col="_h", max_hamming=3, bands=4,
            max_bucket=mb,
        ).count()
        dt = time.time() - t0
        release_skew_guard_caches()
        print(json.dumps(
            {"n": n, "mode": "cross", "max_bucket": mb,
             "wall_s": round(dt, 1), "pairs": found}
        ))
        spark.stop()
        return
    base = F.xxhash64(F.expr("id - CASE WHEN id % 20 = 19 THEN 1 ELSE 0 END"))
    flips = F.expr(
        "CASE WHEN id % 20 != 19 THEN 0L ELSE "
        "shiftleft(1L, int(id * 7 % 64)) | shiftleft(1L, int(id * 13 % 64)) END"
    )
    df = ids.select(F.col("id").alias("doc_id"), base.bitwiseXOR(flips).alias("_h"))
    t0 = time.time()
    pairs = hamming_pairs(
        df, hash_col="_h", id_col="doc_id", max_hamming=3, bands=4,
        max_bucket=mb,
    )
    found = pairs.count()
    dt = time.time() - t0
    release_skew_guard_caches()
    print(json.dumps(
        {"n": n, "max_bucket": mb, "wall_s": round(dt, 1), "pairs": found}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
