"""Emulates the driver's correctness gate locally: runs every
``__spark_entry__.queries()`` entry against its ``oracle_sql()`` twin at
a given SF and compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by
all columns, exact value equality).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")


def normalize(df) -> tuple[list[str], list[tuple]]:
    """pandas DataFrame → (sorted column names, sorted row tuples)."""
    cols = sorted(df.columns)
    out = df[cols]
    rows = []
    for tup in out.itertuples(index=False):
        row = []
        for v in tup:
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float):
                v = repr(v)
            row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return cols, rows


def value_hash(rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update("\x01".join(r).encode())
        h.update(b"\x02")
    return h.hexdigest()[:16]


def main() -> int:
    import os

    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # the IVF oracles embed centroids recomputed from the oracle SF's
    # parquet — keep them bound to the SF under test
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entry
    from vearch_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in entry.__dict__.get("_ORACLE_TABLES", None) or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    if only:
        unknown = sorted(set(only) - set(queries))
        if unknown:
            # a typo must not skip every check and print a false ALL OK
            print(f"unknown query name(s): {', '.join(unknown)}")
            sys.exit(2)
    from vearch_spark.operators.dedup import release_skew_guard_caches

    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        # free the LSH skew guard's banded-relation cache after each
        # materialization — a full 80+-query session otherwise pins
        # one cached relation per dedup invocation
        release_skew_guard_caches()
        if name not in oracles:
            print(f"  {name:28s} rows={len(sdf):6d}  (rows-only, no oracle)  {t_spark:.1f}s")
            continue
        odf = con.execute(oracles[name]).df()
        scols, srows = normalize(sdf)
        ocols, orows = normalize(odf)
        ok_cols = scols == ocols
        ok_count = len(srows) == len(orows)
        ok_hash = value_hash(srows) == value_hash(orows)
        status = "OK " if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(
            f"  {name:28s} {status} rows={len(srows):6d}/{len(orows):<6d} "
            f"cols={'=' if ok_cols else f'{scols} vs {ocols}'} "
            f"hash={'=' if ok_hash else 'MISMATCH'}  {t_spark:.1f}s"
        )
        if not (ok_cols and ok_count and ok_hash):
            failures += 1
            for i, (a, b) in enumerate(zip(srows, orows)):
                if a != b:
                    print(f"      first diff row {i}:\n        spark:  {a}\n        oracle: {b}")
                    break
    spark.stop()
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
