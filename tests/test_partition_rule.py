"""RANGE partition rule parity (partition.go:128-151, space.go:255-285,
partition_names pruning doc_query.go:1565-1580)."""

import os

import pytest

from vearch_spark.errors import DocumentError, SchemaError, SearchError
from vearch_spark.schema import (
    FieldSpec,
    FieldType,
    IndexSpec,
    PartitionRule,
    SpaceSchema,
)
from vearch_spark.space import Space

RANGES = [("p2020", "2021-01-01"), ("p2021", "2022-01-01"), ("p2022", "2023-01-01")]


def make_schema():
    return SpaceSchema(
        name="tl",
        fields=[
            FieldSpec("ts", FieldType.DATE, index=IndexSpec("ts", "SCALAR")),
            FieldSpec("field_int", FieldType.INT, index=IndexSpec("field_int", "SCALAR")),
            FieldSpec("vec", FieldType.VECTOR, dimension=2, index=IndexSpec("vec", "FLAT")),
        ],
        partition_rule=PartitionRule(field="ts", ranges=RANGES),
    )


def rows():
    import datetime as dt

    stamps = ["2020-03-01", "2020-07-01", "2021-02-01", "2021-08-01", "2022-05-01"]
    return [
        {
            "_id": str(i),
            "ts": dt.datetime.fromisoformat(s),
            "field_int": i,
            "vec": [float(i), 0.0],
        }
        for i, s in enumerate(stamps)
    ]


def test_rule_requires_date_field():
    with pytest.raises(SchemaError):
        SpaceSchema(
            name="bad",
            fields=[FieldSpec("x", FieldType.INT)],
            partition_rule=PartitionRule(field="x", ranges=RANGES),
        )
    with pytest.raises(SchemaError):
        PartitionRule(field="ts", ranges=[("a", "2021-01-01"), ("a", "2022-01-01")])


def test_routing_and_targeting(spark):
    sp = Space(spark, make_schema())
    sp.upsert(rows())
    # routing: first range whose upper bound exceeds the value
    got = {r._id: r._partition_name for r in sp.df.select("_id", "_partition_name").collect()}
    assert got == {"0": "p2020", "1": "p2020", "2": "p2021", "3": "p2021", "4": "p2022"}
    # out-of-range doc rejected at ingest
    import datetime as dt

    with pytest.raises(DocumentError):
        sp.upsert([{"_id": "x", "ts": dt.datetime(2025, 1, 1), "field_int": 9, "vec": [0.0, 0.0]}])
    # partition_names restricts the query verb
    ids = sorted(r._id for r in sp.query(limit=100, partition_names=["p2021"]).collect())
    assert ids == ["2", "3"]
    ids = sorted(
        r._id for r in sp.query(limit=100, partition_names=["p2020", "p2022"]).collect()
    )
    assert ids == ["0", "1", "4"]
    with pytest.raises(SearchError):
        sp.query(partition_names=["nope"])
    # ...and the search verb
    hits = sp.search(vector=[0.0, 0.0], vector_field="vec", limit=10,
                     partition_names=["p2021"]).collect()
    assert sorted(h._id for h in hits) == ["2", "3"]
    # routing field cannot move a doc in place
    with pytest.raises(DocumentError):
        sp.partial_update("0", {"ts": dt.datetime(2021, 6, 1)})


def test_physical_pruning(spark, tmp_path):
    """Path-backed space writes partitionBy(_partition_name); a
    partition_names target must prune parquet directories in the plan."""
    sp = Space(spark, make_schema(), path=str(tmp_path / "tl"))
    sp.upsert(rows())
    # physical layout: v1/b{bucket}/_partition_name=... — range partitions
    # nest inside each hash bucket so point writes stay bucket-bounded
    vdir = os.path.join(sp.path, "v1")
    subdirs = {
        d
        for b in os.listdir(vdir)
        if b.startswith("b") and os.path.isdir(os.path.join(vdir, b))
        for d in os.listdir(os.path.join(vdir, b))
        if d.startswith("_partition_name=")
    }
    assert subdirs <= {
        "_partition_name=p2020",
        "_partition_name=p2021",
        "_partition_name=p2022",
    } and "_partition_name=p2021" in subdirs
    plan = sp.query(limit=100, partition_names=["p2021"])._jdf.queryExecution().executedPlan().toString()
    assert "p2021" in plan
    # the scan must carry a partition filter, not a post-scan row filter
    assert "PartitionFilters: [" in plan and "_partition_name" in plan.split("PartitionFilters:")[1][:200]
    ids = sorted(r._id for r in sp.query(limit=100, partition_names=["p2021"]).collect())
    assert ids == ["2", "3"]


def test_hnsw_search_with_partition_names_fills_limit(spark):
    """partition_names over an HNSW index: the target predicate rides
    the probe's allow flag (filter-during-traversal), so a search
    scoped to one small partition still fills the limit from exactly
    that partition's docs — never a post-filtered near-empty page.
    Docs are hash-sharded across graphs independent of the range
    partition, the worst case for post-filtering."""
    import datetime as dt

    schema = SpaceSchema(
        name="hnsw_parts",
        fields=[
            FieldSpec("ts", FieldType.DATE, index=IndexSpec("ts", "SCALAR")),
            FieldSpec("vec", FieldType.VECTOR, dimension=2,
                      index=IndexSpec("vec", "HNSW",
                                      params={"nlinks": 8, "efConstruction": 32,
                                              "nshards": 2})),
        ],
        partition_rule=PartitionRule(field="ts", ranges=RANGES),
    )
    sp = Space(spark, schema)
    docs = []
    for i in range(120):
        # ~8% of docs land in p2021; the rest in p2020
        stamp = "2021-06-01" if i % 12 == 0 else "2020-06-01"
        docs.append({"_id": str(i), "ts": dt.datetime.fromisoformat(stamp),
                     "vec": [float(i), 0.0]})
    sp.upsert(docs)
    sp.build_index("vec", training_threshold=10)
    got = sp.search(vector=[0.0, 0.0], limit=8, is_brute_search=0,
                    partition_names=["p2021"]).collect()
    ids = [int(r._id) for r in got]
    assert len(ids) == 8  # the limit fills despite ~8% selectivity
    assert all(i % 12 == 0 for i in ids)  # only p2021 docs
    # and they are the nearest p2021 docs, in order
    assert ids == [0, 12, 24, 36, 48, 60, 72, 84]


def test_drop_partition_removes_range_and_docs(spark):
    """operator_type=DROP (space_service.go:1055-1098,
    test_module_partition.py::test_drop_partitions): the named range
    leaves the rule and its documents are deleted."""
    from vearch_spark import api

    sp = Space(spark, make_schema())
    sp.upsert(rows())
    n_before = sp.count()
    out = api.update_space(
        sp, {"operator_type": "DROP", "partition_name": "p2021"}
    )
    names = [r["name"] for r in out["partition_rule"]["ranges"]]
    assert names == ["p2020", "p2022"]
    # the two 2021-docs are gone; remaining docs intact
    assert sp.count() == n_before - 2
    assert sp.schema.partition_rule.names() == ["p2020", "p2022"]
    # dropped partition is no longer a valid target
    with pytest.raises(SearchError):
        sp.query(limit=10, partition_names=["p2021"])
    # a doc in the dropped range's old span now routes to the next
    # bound (first-bound-exceeding routing): p2021's span joins p2022
    sp.upsert([{"_id": "x1", "ts": __import__("datetime").datetime.fromisoformat("2021-06-01"),
                "field_int": 1, "vec": [0.1, 0.2]}])
    hits = sp.query(limit=10, partition_names=["p2022"]).collect()
    assert "x1" in [r["_id"] for r in hits]


def test_drop_partition_validation(spark):
    from vearch_spark import api

    sp = Space(spark, make_schema())
    with pytest.raises(DocumentError):
        sp.update_partition_rule("DROP")  # name empty (space_service.go:1056)
    with pytest.raises(DocumentError):
        sp.update_partition_rule("DROP", partition_name="nope")  # not exist
    with pytest.raises(DocumentError):
        sp.update_partition_rule("MERGE", partition_name="p2020")  # bad op
    with pytest.raises(DocumentError):
        api.update_space(sp, {})  # neither partition_num nor operator_type


def test_add_partitions_merges_sorted_and_rejects_collisions(spark):
    """operator_type=ADD (space_service.go:1100-1150; RangeIsSame
    partition.go:256-280): new ranges join the rule; name OR value
    collisions reject; bounds keep ascending order regardless of
    request order."""
    from vearch_spark import api

    sp = Space(spark, make_schema())
    sp.upsert(rows())
    out = api.update_space(sp, {
        "operator_type": "ADD",
        "partition_rule": {"ranges": [
            {"name": "p2024", "value": "2025-01-01"},   # out of order on purpose
            {"name": "p2023", "value": "2024-01-01"},
        ]},
    })
    names = [r["name"] for r in out["partition_rule"]["ranges"]]
    assert names == ["p2020", "p2021", "p2022", "p2023", "p2024"]
    # the new range accepts ingest and is targetable
    import datetime as dt

    sp.upsert([{"_id": "n1", "ts": dt.datetime.fromisoformat("2024-06-01"),
                "field_int": 9, "vec": [0.5, 0.5]}])
    hits = sp.query(limit=10, partition_names=["p2024"]).collect()
    assert [r["_id"] for r in hits] == ["n1"]
    # collisions: existing name / existing value / within-request dupes
    with pytest.raises(DocumentError):
        sp.update_partition_rule("ADD", ranges=[("p2020", "2030-01-01")])
    with pytest.raises(DocumentError):
        sp.update_partition_rule("ADD", ranges=[("pX", "2022-01-01")])
    with pytest.raises(DocumentError):
        sp.update_partition_rule("ADD", ranges=[("pY", "2031-01-01"), ("pY", "2032-01-01")])
    with pytest.raises(DocumentError):
        sp.update_partition_rule("ADD")  # empty rule (space_service.go:1101)


def test_drop_partition_on_bucketed_space(spark, tmp_path):
    """DROP on a path-backed space: the delete rewrites only buckets
    holding affected rows, the physical _partition_name=p2021 dirs stop
    being referenced, and reads after the drop are consistent."""
    sp = Space(spark, make_schema(), path=str(tmp_path / "tl2"))
    sp.upsert(rows())
    n = sp.count()
    sp.update_partition_rule("DROP", partition_name="p2021")
    assert sp.count() == n - 2
    assert sorted(r._id for r in sp.query(limit=100).collect()) == ["0", "1", "4"]
    # reopened from disk, the data state persists (the rule itself is
    # schema-level — the caller's registry carries it, as with create)
    reopened = Space(spark, make_schema(), path=str(tmp_path / "tl2"))
    assert reopened.count() == n - 2


def test_add_partition_requires_name_and_value(spark):
    """A {"value": ...} entry without a name must reject — not coerce
    to a partition literally named "None"."""
    from vearch_spark import api

    sp = Space(spark, make_schema())
    with pytest.raises(DocumentError):
        api.update_space(sp, {"operator_type": "ADD", "partition_rule": {
            "ranges": [{"value": "2030-01-01"}]}})
    with pytest.raises(DocumentError):
        sp.update_partition_rule("ADD", ranges=[("p9", None)])
    assert sp.schema.partition_rule.names() == ["p2020", "p2021", "p2022"]
