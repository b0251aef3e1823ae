"""Scale evidence for the streaming corpus index: per-batch cost must
stay FLAT while the accumulated corpus grows 100k → 1M docs.

CorpusDeltaDedup (streaming/corpus.py) promises O(batch + index IO)
per micro-batch — matching reads the durable fingerprint/signature/
postings relations, never re-shingling corpus text — so batch seconds
must not trend with accumulated size. tools/stress_dedup.py only
accumulates to ~N/2 of a small N; this harness drives the regime where
the stored index actually dominates the batch (VERDICT r03 item 4).

Usage: python tools/stress_corpus_1m.py [total_docs] [n_batches]
Defaults 1_000_000 / 10. Prints one JSON line:
{"batch_docs": ..., "batch_s": [...], "first_to_last_ratio": ...,
 "accumulated_docs": ..., "rejected": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

VOCAB = 5000
DOC_LEN = 60
DUP_EVERY = 20  # every 20th doc is a near-dup of the previous base doc


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    from vearch_spark.session import get_spark
    from vearch_spark.streaming.corpus import CorpusDeltaDedup

    spark = get_spark(app_name="corpus-stress-1m")

    # ~10% of every batch re-presents batch-0 content (5% exact copies,
    # 5% near copies with 3 flipped tokens), so the CROSS-BATCH match
    # path — the thing whose cost must stay flat — fires on every batch
    @pandas_udf("string")
    def synth_text(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            r = i % DUP_EVERY
            base = (i % 10_000) // DUP_EVERY * DUP_EVERY if r in (5, 10) else i
            toks = np.random.default_rng(base).integers(0, VOCAB, size=DOC_LEN)
            if r == 5:  # near copy: flip 3 tokens
                flip = np.random.default_rng(i).integers(0, DOC_LEN, size=3)
                toks = toks.copy()
                toks[flip] = np.random.default_rng(i + 1).integers(0, VOCAB, size=3)
            out.append(" ".join(f"w{t}" for t in toks))
        return pd.Series(out)

    bs = total // n_batches
    d = tempfile.mkdtemp(prefix="corpus_stress_1m_")
    ing = CorpusDeltaDedup(d + "/c", jaccard_threshold=0.5)
    batch_s: list[float] = []
    for e in range(n_batches):
        b = (
            spark.range(e * bs, (e + 1) * bs)
            .withColumnRenamed("id", "doc_id")
            .repartition(32)
            .withColumn("text", synth_text("doc_id"))
            .persist()
        )
        b.count()  # materialize generation OUTSIDE the timed region
        t0 = time.time()
        ing.process_batch(b, e)
        batch_s.append(round(time.time() - t0, 2))
        b.unpersist()
        print(f"# batch {e}: {batch_s[-1]}s (accumulated {(e + 1) * bs})",
              file=sys.stderr)

    try:
        rejected = spark.read.parquet(d + "/c/rejects").count()
    except Exception:
        rejected = 0
    out = {
        "batch_docs": bs,
        "n_batches": n_batches,
        "batch_s": batch_s,
        # flatness metric: last-3 mean over first-3 mean (1.0 = flat)
        "first_to_last_ratio": round(
            (sum(batch_s[-3:]) / 3) / (sum(batch_s[:3]) / 3), 2
        ),
        "accumulated_docs": total,
        "rejected": rejected,
    }
    shutil.rmtree(d)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
