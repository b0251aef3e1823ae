"""JSONL bulk ingest: schema-checked distributed parse (SURVEY §3.3)."""

import json

import pytest

from vearch_spark.errors import DocumentError
from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema
from vearch_spark.sources.jsonl import load_jsonl, read_jsonl
from vearch_spark.space import Space


def make_schema():
    return SpaceSchema(
        name="docs",
        fields=[
            FieldSpec("field_int", FieldType.INT, index=IndexSpec("field_int", "SCALAR")),
            FieldSpec("field_vector", FieldType.VECTOR, dimension=4,
                      index=IndexSpec("field_vector", "FLAT")),
        ],
    )


def write_lines(tmp_path, lines):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines))
    return str(p)


def test_read_jsonl_valid_and_rejects(spark, tmp_path):
    good = [json.dumps({"_id": str(i), "field_int": i, "field_vector": [0.1] * 4})
            for i in range(5)]
    bad = [
        '{"_id": "x", "field_int": 1, "nope": 2, "field_vector": [0.1,0.1,0.1,0.1]}',
        '{"_id": "y", "field_int": 1, "field_vector": [0.1, 0.2]}',
        "{not json",
    ]
    path = write_lines(tmp_path, good + bad)
    docs, rejects = read_jsonl(spark, path, make_schema())
    assert docs.count() == 5
    reasons = sorted(r.reason for r in rejects.collect())
    assert len(reasons) == 3
    assert any("unknown fields: nope" in r for r in reasons)
    assert any("length != 4" in r for r in reasons)
    assert any("malformed" in r for r in reasons)


def test_read_jsonl_ill_typed_field_rejected(spark, tmp_path):
    # PERMISSIVE from_json nulls a failed cast — the key-present/
    # parsed-NULL audit must reject instead of silently loading
    lines = [
        '{"_id": "a", "field_int": "abc", "field_vector": [0.1,0.1,0.1,0.1]}',
        '{"_id": "b", "field_int": null, "field_vector": [0.1,0.1,0.1,0.1]}',
        '{"_id": "c", "field_int": 3, "field_vector": "nope"}',
    ]
    docs, rejects = read_jsonl(spark, write_lines(tmp_path, lines), make_schema())
    assert docs.count() == 0
    reasons = sorted(r.reason for r in rejects.collect())
    assert reasons == [
        "ill-typed field: field_int",
        "ill-typed field: field_int",
        "ill-typed field: field_vector",
    ]


def test_read_jsonl_missing_id_synthesized_deterministic(spark, tmp_path):
    # id-less lines get md5(line) — distinct docs stay distinct (they
    # used to collapse onto NULL in the upsert LWW window), and the
    # same line always maps to the same id (task-retry idempotent)
    lines = [
        json.dumps({"field_int": 1, "field_vector": [0.1] * 4}),
        json.dumps({"field_int": 2, "field_vector": [0.2] * 4}),
    ]
    path = write_lines(tmp_path, lines)
    docs, rejects = read_jsonl(spark, path, make_schema())
    assert rejects.count() == 0
    rows = docs.collect()
    ids = {r._id for r in rows}
    assert len(ids) == 2 and all(i and len(i) == 32 for i in ids)
    again = {r._id for r in read_jsonl(spark, path, make_schema())[0].collect()}
    assert again == ids


def test_load_jsonl_strict_raises(spark, tmp_path):
    path = write_lines(tmp_path, ['{"_id": "a", "field_int": 1, "bogus": true}'])
    sp = Space(spark, make_schema())
    with pytest.raises(DocumentError, match="bogus"):
        load_jsonl(spark, path, sp, strict=True)


def test_load_jsonl_permissive_loads_valid(spark, tmp_path):
    lines = [
        json.dumps({"_id": "a", "field_int": 1, "field_vector": [0.1] * 4}),
        '{"_id": "b", "oops": 1}',
    ]
    sp = Space(spark, make_schema())
    n = load_jsonl(spark, write_lines(tmp_path, lines), sp, strict=False)
    assert n == 1
    assert sp.count() == 1
    assert sp.get(["a"]).count() == 1


def test_binary_field_expects_packed_bytes(spark, tmp_path):
    """BINARYIVF fields carry d/8 packed bytes — validating against the
    raw bit dimension rejected every valid binary document."""
    sch = SpaceSchema(name="bin", fields=[
        FieldSpec("code", FieldType.VECTOR, dimension=32,
                  index=IndexSpec("code", "BINARYIVF")),
    ])
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"_id": "ok", "code": [1, 2, 3, 4]}\n'
        '{"_id": "bad", "code": [1, 2, 3, 4, 5]}\n'
    )
    docs, rejects = read_jsonl(spark, str(p), sch)
    assert [r._id for r in docs.collect()] == ["ok"]
    assert rejects.count() == 1 and "length != 4" in rejects.first().reason
