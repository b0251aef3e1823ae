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
