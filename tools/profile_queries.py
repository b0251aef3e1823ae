"""Per-query profile: wall (min of N), Spark job count, stage count,
task count — measured warm, bench-identical count() action.

Usage: python tools/profile_queries.py [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from vearch_spark.operators.dedup import release_skew_guard_caches
    from vearch_spark.session import get_spark

    spark = get_spark(app_name="query-profile")
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()

    qs = entry.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    # pre-build indexes exactly like bench.py
    for kind in ("ivfflat", "ivfpq", "ivfrabitq", "binaryivf", "ivf2", "scann"):
        entry._ivf_index(spark, sf_dir, kind)
    entry._hnsw_index(spark, sf_dir)
    entry.q_diskann_knn(spark, sf_dir).count()
    entry._bm25_index(spark, sf_dir)
    entry.q_lm_perplexity(spark, sf_dir).count()

    # warm pass
    for fn in qs.values():
        fn(spark, sf_dir).count()
        release_skew_guard_caches()

    def counters():
        jobs = store.jobsList(None)
        n_jobs = jobs.size()
        n_stages = 0
        n_tasks = 0
        it = jobs.iterator()
        while it.hasNext():
            j = it.next()
            n_stages += j.stageIds().size()
            n_tasks += j.numTasks()
        return n_jobs, n_stages, n_tasks

    out = {}
    for name, fn in qs.items():
        release_skew_guard_caches()
        best = None
        jc = sc0 = tc = 0
        for _ in range(2):
            j0, s0, t0c = counters()
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            j1, s1, t1c = counters()
            if best is None or dt < best:
                best, jc, sc0, tc = dt, j1 - j0, s1 - s0, t1c - t0c
        out[name] = {"s": round(best, 3), "jobs": jc, "stages": sc0,
                     "tasks": tc}
        print(f"{best:7.3f}s  jobs={jc:3d} stages={sc0:3d} tasks={tc:5d}  {name}",
              flush=True)
    with open("/tmp/query_profile.json", "w") as fh:
        json.dump(out, fh)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
