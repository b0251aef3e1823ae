"""Round benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is executed to completion (count() forces the full plan —
results are small top-k/agg outputs so collect cost is negligible).
A warmup pass on sf0.001 absorbs JVM/codegen startup so the numbers
reflect steady-state query time, mirroring the reference's QPS harness
(scripts/benchmarks/restful.py) which also measures warm servers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as entry
    from vearch_spark.session import get_spark

    spark = get_spark(app_name="vearch-spark-bench")

    qs = entry.queries()
    # warmup: tiny SF to JIT the plans
    for fn in qs.values():
        try:
            fn(spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
