"""End-to-end lifecycle mirroring the reference's test_vearch.py flow
(SURVEY.md §5): create db/space with the canonical fixture schema
(vearch_utils.py:1336-1404) → upsert in batches → get by ids → filter
query → hybrid search → partial update → delete → drop. One test, the
whole public surface in reference order.
"""

import pytest
from pyspark.sql import functions as F

from vearch_spark.errors import DocumentError
from vearch_spark.registry import Registry
from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema

DIM = 8
N = 100
BATCH = 25  # reference ingests in parallel batches of 100 on 10k docs


def canonical_schema():
    """F1 `docs` (FIXTURES.md): the reference's canonical mixed-type
    space, field names included."""
    return SpaceSchema(
        name="ts_space",
        fields=[
            FieldSpec("field_int", FieldType.INT, index=IndexSpec("field_int", "SCALAR")),
            FieldSpec("field_long", FieldType.LONG, index=IndexSpec("field_long", "SCALAR")),
            FieldSpec("field_float", FieldType.FLOAT, index=IndexSpec("field_float", "SCALAR")),
            FieldSpec("field_double", FieldType.DOUBLE, index=IndexSpec("field_double", "SCALAR")),
            FieldSpec("field_string", FieldType.STRING, index=IndexSpec("field_string", "SCALAR")),
            FieldSpec("field_string_array", FieldType.STRING_ARRAY,
                      index=IndexSpec("field_string_array", "SCALAR")),
            FieldSpec("field_vector", FieldType.VECTOR, dimension=DIM,
                      index=IndexSpec("field_vector", "FLAT")),
        ],
    )


def doc(i):
    return {
        "_id": str(i),
        "field_int": i,
        "field_long": i * 10,
        "field_float": float(i) / 2,
        "field_double": float(i),
        "field_string": f"str{i % 7}",
        "field_string_array": [f"tag{i % 3}", f"tag{i % 5}"],
        # deterministic f(_id, dim-pos) per FIXTURES.md
        "field_vector": [float((i * 31 + j) % 17) for j in range(DIM)],
    }


def test_full_lifecycle(spark):
    reg = Registry(spark)
    reg.create_db("ts_db")
    space = reg.create_space("ts_db", canonical_schema())

    # -- upsert in batches (reference: parallel batch ingest)
    for start in range(0, N, BATCH):
        space.upsert([doc(i) for i in range(start, start + BATCH)])
    assert space.count() == N

    # -- get by ids echoes field values (test_document_query shape)
    got = {r._id: r for r in space.get(["3", "17", "88"]).collect()}
    assert set(got) == {"3", "17", "88"}
    assert got["17"].field_string == f"str{17 % 7}"
    assert got["88"].field_long == 880

    # -- filter query: ranges, terms, AND (test_module_filter shape)
    flt = {
        "operator": "AND",
        "conditions": [
            {"field": "field_double", "operator": ">=", "value": 20.0},
            {"field": "field_double", "operator": "<", "value": 40.0},
            {"field": "field_string", "operator": "IN", "value": ["str3", "str4"]},
        ],
    }
    rows = space.query(flt=flt, limit=100).collect()
    exp = [i for i in range(20, 40) if i % 7 in (3, 4)]
    assert sorted(int(r._id) for r in rows) == exp
    # ingest (_seq) order, not id order
    assert [int(r._id) for r in rows] == exp

    # string-array membership: any element matches
    arr_rows = space.query(
        flt={"operator": "AND",
             "conditions": [{"field": "field_string_array", "operator": "IN",
                             "value": ["tag1"]}]},
        limit=N,
    ).collect()
    exp_arr = sorted(i for i in range(N) if i % 3 == 1 or i % 5 == 1)
    assert sorted(int(r._id) for r in arr_rows) == exp_arr

    # -- hybrid search: filtered exact top-k, L2 asc (test_document_search)
    q = doc(42)["field_vector"]
    hits = space.search(vector=q, vector_field="field_vector", limit=5,
                        flt={"operator": "AND",
                             "conditions": [{"field": "field_int", "operator": ">=",
                                             "value": 40}]}).collect()
    assert len(hits) == 5
    assert hits[0]._id == "42" and hits[0]._score == 0.0
    assert all(int(h._id) >= 40 for h in hits)
    scores = [h._score for h in hits]
    assert scores == sorted(scores)

    # -- partial update patches one field, search sees it (Engine::Update)
    space.partial_update("42", {"field_string": "patched"})
    assert space.get(["42"]).collect()[0].field_string == "patched"
    assert space.count() == N  # no new doc

    # -- upsert same _id replaces, keeps _seq (docid stable on update)
    seq_before = space.df.where(F.col("_id") == "7").collect()[0]._seq
    space.upsert([{**doc(7), "field_int": 7000}])
    row7 = space.df.where(F.col("_id") == "7").collect()[0]
    assert row7.field_int == 7000 and row7._seq == seq_before

    # -- delete by ids, then by query (returned ids)
    assert space.delete(["0", "1", "2"]) == 3
    doomed = space.delete_by_query(
        {"operator": "AND",
         "conditions": [{"field": "field_int", "operator": ">=", "value": 90},
                        {"field": "field_int", "operator": "<", "value": 95}]}
    )
    assert sorted(doomed) == ["90", "91", "92", "93", "94"]
    assert space.count() == N - 8

    # deleted docs invisible to search (deletion-bitmap parity)
    hits2 = space.search(vector=doc(91)["field_vector"],
                         vector_field="field_vector", limit=3).collect()
    assert "91" not in {h._id for h in hits2}

    # -- get cap and unknown-field rejection (doc_http.go:579-583 / CheckDoc)
    with pytest.raises(DocumentError):
        space.get([str(i) for i in range(501)])
    with pytest.raises(DocumentError):
        space.partial_update("5", {"nope": 1})

    # -- drop space, db
    reg.drop_space("ts_db", "ts_space")
    reg.drop_db("ts_db")
    assert reg.list_dbs() == []


def test_admin_lifecycle_reference_payloads(spark):
    """The full admin lifecycle driven by the reference's JSON payloads
    in reference order (test_module_partition.py:268-318 DROP→ADD,
    test_module_space.py partition_num / config / indexes): range-rule
    DROP deletes the range and its docs; ADD accepts the reference's
    out-of-order ranges payload and re-ingests; partition_num grows
    (reduction rejects); config round-trips; index list/remove."""
    import datetime as dt

    from vearch_spark import api
    from vearch_spark.schema import PartitionRule

    schema = SpaceSchema(
        name="ts_admin",
        fields=[
            FieldSpec("ts", FieldType.DATE, index=IndexSpec("ts", "SCALAR")),
            FieldSpec("field_float", FieldType.FLOAT,
                      index=IndexSpec("field_float", "SCALAR")),
            FieldSpec("field_vector", FieldType.VECTOR, dimension=DIM,
                      index=IndexSpec("field_vector", "FLAT")),
        ],
        partition_rule=PartitionRule(
            field="ts",
            ranges=[("p0", "2024-01-01"), ("p1", "2024-02-01"),
                    ("p2", "2024-03-01")],
        ),
    )
    reg = Registry(spark)
    reg.create_db("ts_db")
    sp = reg.create_space("ts_db", schema)

    def docs_for(month_starts):
        return [
            {"_id": f"{m}-{i}", "ts": dt.datetime.fromisoformat(m),
             "field_float": float(i), "field_vector": [float(i)] * DIM}
            for m in month_starts for i in range(10)
        ]

    api.upsert(sp, {"documents": docs_for(
        ["2023-12-15", "2024-01-15", "2024-02-15"])})
    assert sp.count() == 30

    # DROP p1 (reference payload: operator_type + partition_name)
    out = api.update_space(sp, {"operator_type": "DROP", "partition_name": "p1"})
    names = [r["name"] for r in out["partition_rule"]["ranges"]]
    assert names == ["p0", "p2"]
    assert sp.count() == 20  # p1's docs deleted with the range
    desc = sp.describe()
    assert [r for r in desc["partition_rule"]["ranges"]] == ["p0", "p2"]

    # ADD back p1 plus p3, ranges deliberately OUT OF ORDER in the
    # payload (the reference sends p3 before p1; the merged rule comes
    # back bound-ordered)
    out = api.update_space(sp, {
        "operator_type": "ADD",
        "partition_rule": {"ranges": [
            {"name": "p3", "value": "2024-04-01"},
            {"name": "p1", "value": "2024-02-01"},
        ]},
    })
    names = [r["name"] for r in out["partition_rule"]["ranges"]]
    assert names == ["p0", "p1", "p2", "p3"]
    # 2024-01-15 routes to the re-added p1 (its docs died with the
    # DROP); 2024-03-15 routes to the new p3
    api.upsert(sp, {"documents": docs_for(["2024-01-15", "2024-03-15"])})
    assert sp.count() == 40
    # partition-targeted query through the verb payload
    got = api.query(sp, {"filters": {"operator": "AND", "conditions": [
        {"field": "field_float", "operator": ">=", "value": 0}]},
        "limit": 50, "partition_names": ["p1"]}).count()
    assert got == 10

    # duplicate-name / duplicate-value ADDs reject (RangeIsSame)
    with pytest.raises(DocumentError):
        api.update_space(sp, {"operator_type": "ADD", "partition_rule": {
            "ranges": [{"name": "p1", "value": "2025-01-01"}]}})
    with pytest.raises(DocumentError):
        api.update_space(sp, {"operator_type": "ADD", "partition_rule": {
            "ranges": [{"name": "p9", "value": "2024-02-01"}]}})

    # partition_num: grow-only (test_module_space.py::test_update_space_partition)
    assert api.update_space(sp, {"partition_num": 24}) == {"partition_num": 24}
    with pytest.raises(DocumentError):
        api.update_space(sp, {"partition_num": 8})
    with pytest.raises(DocumentError):
        api.update_space(sp, {"partition_num": "lots"})
    assert sp.count() == 40  # re-bucketed, nothing lost

    # config GET/POST partial merge (config_service.go:97-133)
    cfg = api.update_config(sp, {"refresh_interval": 250})
    assert cfg["refresh_interval"] == 250
    assert api.get_config(sp)["refresh_interval"] == 250

    # index list / remove (cluster_api.go:291-294)
    idx = api.list_indexes(sp, db_name="ts_db")
    assert idx["db_name"] == "ts_db"
    names = {i["name"] for i in idx["indexes"]}
    assert {"ts", "field_float", "field_vector"} <= names
    left = api.delete_index(sp, "field_float")
    assert "field_float" not in {i["name"] for i in left["indexes"]}

    # rebuild + forcemerge round out the admin verbs
    assert api.index_rebuild(sp, {"drop_before_rebuild": True}) == []
    assert api.index_forcemerge(sp) == 0  # in-memory space: nothing to vacuum

    reg.drop_space("ts_db", "ts_admin")
    reg.drop_db("ts_db")
    assert reg.list_dbs() == []
