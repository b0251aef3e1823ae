"""CRUD lifecycle parity (SURVEY.md §2.1) on an in-memory Space."""

import pytest

from vearch_spark.errors import DocumentError, SearchError
from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema
from vearch_spark.space import Space


def make_schema():
    return SpaceSchema(
        name="docs",
        fields=[
            FieldSpec("field_int", FieldType.INT, index=IndexSpec("field_int", "SCALAR")),
            FieldSpec("field_string", FieldType.STRING, index=IndexSpec("field_string", "SCALAR")),
            FieldSpec("field_vector", FieldType.VECTOR, dimension=4, index=IndexSpec("field_vector", "FLAT")),
        ],
    )


def rows(n, start=0):
    return [
        {
            "_id": str(i),
            "field_int": i,
            "field_string": f"s{i % 3}",
            "field_vector": [float(i), 0.0, 1.0, float(i % 5)],
        }
        for i in range(start, start + n)
    ]


@pytest.fixture()
def space(spark):
    sp = Space(spark, make_schema())
    sp.upsert(rows(10))
    return sp


def test_upsert_insert(space):
    assert space.count() == 10


def test_upsert_overwrite_keeps_seq(space):
    seq_before = {r._id: r._seq for r in space.df.select("_id", "_seq").collect()}
    space.upsert([{"_id": "3", "field_int": 333, "field_string": "zz", "field_vector": [9.0, 9.0, 9.0, 9.0]}])
    assert space.count() == 10
    row = space.df.where("_id = '3'").collect()[0]
    assert row.field_int == 333
    # docid (seq) is stable across update (engine.cc:747)
    assert row._seq == seq_before["3"]


def test_autogen_id(spark):
    sp = Space(spark, make_schema())
    sp.upsert([{"field_int": 1, "field_string": "x", "field_vector": [1.0, 2.0, 3.0, 4.0]}])
    r = sp.df.collect()[0]
    assert r._id and len(r._id) == 32


def test_get_by_ids(space):
    out = space.get(["1", "5", "999"])
    got = sorted(r._id for r in out.collect())
    assert got == ["1", "5"]
    with pytest.raises(DocumentError):
        space.get([str(i) for i in range(501)])


def test_partial_update(space):
    space.partial_update("2", {"field_int": 42})
    row = space.df.where("_id = '2'").collect()[0]
    assert row.field_int == 42
    assert row.field_string == "s2"  # untouched
    with pytest.raises(DocumentError):
        space.partial_update("2", {"nope": 1})


def test_delete_by_ids(space):
    assert space.delete(["1", "2", "404"]) == 2
    assert space.count() == 8


def test_delete_by_query(space):
    doomed = space.delete_by_query(
        {"operator": "AND", "conditions": [{"field": "field_int", "operator": "<", "value": 3}]}
    )
    assert sorted(doomed) == ["0", "1", "2"]
    assert space.count() == 7


def test_delete_by_query_cap_refuses_broad_predicate(space):
    from vearch_spark.errors import DocumentError

    # a broad predicate past the cap must refuse WITHOUT deleting —
    # the driver-side id list never materializes beyond max_ids+1
    with pytest.raises(DocumentError, match="delete_by_query_df"):
        space.delete_by_query(
            {"operator": "AND", "conditions": [{"field": "field_int", "operator": ">=", "value": 0}]},
            max_ids=5,
        )
    assert space.count() == 10


def test_delete_by_query_df_distributed(space):
    # the DataFrame form deletes the same rows but returns the ids as a
    # relation (checkpointed executor-side, valid after the commit)
    matched = space.delete_by_query_df(
        {"operator": "AND", "conditions": [{"field": "field_int", "operator": "<", "value": 3}]}
    )
    assert space.count() == 7
    assert sorted(r._id for r in matched.collect()) == ["0", "1", "2"]


def test_query_scan_ingest_order(space):
    out = space.query(limit=5)
    assert [r._id for r in out.collect()] == ["0", "1", "2", "3", "4"]
    out = space.query(
        flt={"operator": "AND", "conditions": [{"field": "field_string", "operator": "IN", "value": ["s1"]}]},
        limit=50,
    )
    assert [r._id for r in out.collect()] == ["1", "4", "7"]


def test_query_offset_and_pagination(space):
    assert [r._id for r in space.query(limit=3, offset=2).collect()] == ["2", "3", "4"]
    assert [r._id for r in space.query(page_size=3, page_num=2).collect()] == ["3", "4", "5"]


def test_search_on_space(space):
    out = space.search(vector=[5.0, 0.0, 1.0, 0.0], limit=3)
    hits = [r._id for r in out.collect()]
    assert hits[0] == "5"  # exact match row
    assert len(hits) == 3


def test_search_dimension_validation(space):
    with pytest.raises(SearchError):
        space.search(vector=[1.0, 2.0], limit=3)


def test_unknown_batch_field_rejected(spark):
    sp = Space(spark, make_schema())
    df = spark.createDataFrame([("a", 1)], "_id string, bogus int")
    with pytest.raises(DocumentError):
        sp.upsert(df)


def test_persistent_space(spark, tmp_path):
    path = str(tmp_path / "space")
    sp = Space(spark, make_schema(), path=path)
    sp.upsert(rows(5))
    sp.delete(["0"])
    # reopen from disk
    sp2 = Space(spark, make_schema(), path=path)
    assert sp2.count() == 4
    sp2.upsert(rows(2, start=10))
    assert sp2.count() == 6


def test_df_handle_self_heals_after_interrupted_commit(spark, tmp_path):
    """A writer torn down between the durable manifest swap and the
    in-memory refresh (e.g. streaming stop() mid-foreachBatch) must not
    leave the live handle permanently stale: the next read through the
    ``df`` property self-heals to the committed manifest version."""
    path = str(tmp_path / "space")
    sp = Space(spark, make_schema(), path=path)
    sp.upsert(rows(5))
    assert sp.count() == 5

    # interrupt the post-commit refresh: the manifest commits v2 but
    # the live DataFrame handle still reflects v1
    def torn_refresh():
        raise RuntimeError("stream teardown mid-commit")

    sp._refresh_df = torn_refresh
    with pytest.raises(RuntimeError):
        sp.upsert(rows(3, start=10))
    del sp._refresh_df  # restore the bound class method
    assert int(sp._manifest["version"]) == 2  # durable state advanced
    assert sp._df_man_version == 1  # live handle is stale

    # reads self-heal without a reopen, and agree with a fresh handle
    assert sp.count() == 8
    assert sp._df_man_version == 2
    reopened = Space(spark, make_schema(), path=path)
    assert reopened.count() == sp.count()


def test_cursor_scan(space):
    """GetDoc(docid, next) cursor parity (engine.cc:902-912): pages in
    _seq order, resumable from the last _seq, stable across updates."""
    page1 = space.scan(limit=4).collect()
    assert [r.field_int for r in page1] == [0, 1, 2, 3]
    cursor = page1[-1]._seq
    page2 = space.scan(after_seq=cursor, limit=4).collect()
    assert [r.field_int for r in page2] == [4, 5, 6, 7]
    # updates keep _seq (docid stable on update, engine.cc:747): the
    # cursor never revisits or skips an updated doc
    space.upsert([{"_id": "5", "field_int": 50,
                   "field_string": "s0", "field_vector": [0.0, 0.0, 0.0, 0.0]}])
    page2b = space.scan(after_seq=cursor, limit=4).collect()
    assert [r.field_int for r in page2b] == [4, 50, 6, 7]
    # exhaustion
    last = space.scan(after_seq=page2b[-1]._seq, limit=100).collect()
    assert [r.field_int for r in last] == [8, 9]
    assert space.scan(after_seq=last[-1]._seq, limit=10).count() == 0


def test_describe(space):
    d = space.describe()
    assert d["name"] == "docs"
    assert d["doc_count"] == 10
    by_name = {f["name"]: f for f in d["fields"]}
    assert by_name["field_vector"]["dimension"] == 4
    assert by_name["field_vector"]["index"]["type"] == "FLAT"
    assert by_name["field_int"]["index"]["state"] == "INDEXED"
    assert d["partition_rule"] is None


def test_add_index(spark):
    """Dynamic index addition (space.go:87-93): an unindexed field is
    unfilterable until add_index, then filters work."""
    from vearch_spark.errors import SchemaError
    from vearch_spark.filters import compile_filter

    schema = SpaceSchema(
        name="dyn",
        fields=[
            FieldSpec("a", FieldType.INT, index=IndexSpec("a", "SCALAR")),
            FieldSpec("b", FieldType.INT),  # unindexed
        ],
    )
    sp = Space(spark, schema)
    sp.upsert([{"_id": str(i), "a": i, "b": i * 2} for i in range(5)])
    from vearch_spark.errors import FilterError

    flt = {"operator": "AND", "conditions": [{"field": "b", "operator": ">", "value": 4}]}
    with pytest.raises(FilterError):
        compile_filter(flt, sp.schema)  # unindexed-field rejection
    sp.add_index("b", "SCALAR")
    got = sorted(r.b for r in sp.query(flt=flt, limit=10).collect())
    assert got == [6, 8]
    with pytest.raises(SchemaError):
        sp.add_index("b", "FLAT")  # vector index on scalar field


def test_backup_restore(spark, tmp_path):
    sp = Space(spark, make_schema())
    sp.upsert(rows(10))
    sp.partial_update("3", {"field_int": 333})
    n = sp.backup(str(tmp_path / "bak"))
    assert n == 10
    restored = Space.restore(spark, str(tmp_path / "bak"))
    assert restored.count() == 10
    assert restored.schema.to_json() == sp.schema.to_json()
    assert restored.get(["3"]).collect()[0].field_int == 333
    # _seq preserved: scan order identical
    a = [r._id for r in sp.scan(limit=10).collect()]
    b = [r._id for r in restored.scan(limit=10).collect()]
    assert a == b
    # restored space keeps working (upsert continues the seq line)
    restored.upsert([{"_id": "new", "field_int": 1, "field_string": "s0",
                      "field_vector": [0.0, 0.0, 0.0, 0.0]}])
    assert restored.count() == 11
    assert restored.scan(after_seq=None, limit=11).collect()[-1]._id == "new"


def test_slow_search_pool_routing(spark, space):
    """Slow-search isolation (parseSlowSearch doc_query.go:218-234):
    slow requests tag the thread's Spark scheduler pool; fast ones
    clear it."""
    from vearch_spark.space import SLOW_POOL, is_slow_search

    sc = spark.sparkContext
    pool = lambda: sc.getLocalProperty("spark.scheduler.pool")  # noqa: E731

    space.search(vector=[0.0] * 4, limit=500)
    assert pool() == SLOW_POOL
    space.search(vector=[0.0] * 4, limit=10)
    assert pool() is None

    three = {"operator": "AND", "conditions": [
        {"field": "field_int", "operator": ">", "value": 0},
        {"field": "field_int", "operator": "<", "value": 10**9},
        {"field": "field_string", "operator": "IN", "value": ["a"]},
    ]}
    space.search(vector=[0.0] * 4, limit=10, flt=three)
    assert pool() == SLOW_POOL

    # pure-function heuristic: IVF probe >= ncentroids/10 is slow
    class FakeIdx:
        ncentroids, nprobe = 1024, 16
    assert not is_slow_search(10, None, None, FakeIdx())
    assert is_slow_search(10, None, 200, FakeIdx())


def test_distributed_seq_rank_matches_window(spark, monkeypatch):
    """Large batches assign _seq via range-repartition + strided local
    rank instead of a single-partition window; values must stay unique,
    monotone in _id order, and stable across updates (density is not
    part of the contract — the reference docid is per-partition dense
    too, engine.cc:730-752)."""
    import vearch_spark.space as space_mod

    monkeypatch.setattr(space_mod, "_RANK_WINDOW_MAX", 5)
    sp = Space(spark, make_schema())
    sp.upsert(rows(40))
    got = {r["_id"]: r["_seq"] for r in sp.df.select("_id", "_seq").collect()}
    ids = sorted(str(i) for i in range(40))
    seqs = [got[i] for i in ids]
    assert len(set(seqs)) == 40 and seqs == sorted(seqs)  # unique + monotone
    # merge path: 20 existing keys keep their seq, 20 new keys come after
    sp.upsert(rows(40, start=20))
    after = {r["_id"]: r["_seq"] for r in sp.df.select("_id", "_seq").collect()}
    assert all(after[i] == got[i] for i in got)
    new_ids = sorted(str(i) for i in range(40, 60))
    new_seqs = [after[i] for i in new_ids]
    assert len(set(after.values())) == 60
    assert min(new_seqs) > max(seqs)  # insertion order preserved
    assert new_seqs == sorted(new_seqs)  # monotone in _id among new keys


def test_get_by_ids_cap_is_strict(spark):
    """The reference rejects >= 500 ids, not > 500 (doc_http.go:579-583)."""
    import pytest as _pytest

    from vearch_spark.errors import DocumentError
    from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema
    from vearch_spark.space import Space

    schema = SpaceSchema(
        name="cap",
        fields=[FieldSpec("field_int", FieldType.INT,
                          index=IndexSpec("field_int", "SCALAR"))],
    )
    sp = Space(spark, schema)
    sp.get([str(i) for i in range(499)])  # 499 allowed (empty result ok)
    with _pytest.raises(DocumentError):
        sp.get([str(i) for i in range(500)])


def test_partial_update_not_found_and_bad_value(spark):
    """partial_update raises doc-not-found (Engine::Update) and rejects
    a type-invalid scalar instead of silently NULLing the field via a
    lazy cast."""
    import pytest as _pytest

    from vearch_spark.errors import DocumentError
    from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema
    from vearch_spark.space import Space

    schema = SpaceSchema(
        name="pu",
        fields=[FieldSpec("field_int", FieldType.INT,
                          index=IndexSpec("field_int", "SCALAR"))],
    )
    sp = Space(spark, schema)
    sp.upsert([{"_id": "1", "field_int": 1}])
    with _pytest.raises(DocumentError):
        sp.partial_update("ghost", {"field_int": 2})
    with _pytest.raises(DocumentError):
        sp.partial_update("1", {"field_int": "not-a-number"})
    assert sp.get(["1"]).collect()[0].field_int == 1  # untouched
    sp.partial_update("1", {"field_int": 2})
    assert sp.get(["1"]).collect()[0].field_int == 2


def test_query_unknown_sort_field_typed_error(spark):
    from vearch_spark.errors import SchemaError
    from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema
    from vearch_spark.space import Space

    schema = SpaceSchema(
        name="qsort",
        fields=[FieldSpec("field_int", FieldType.INT,
                          index=IndexSpec("field_int", "SCALAR"))],
    )
    sp = Space(spark, schema)
    sp.upsert([{"_id": "1", "field_int": 1}])
    import pytest as _pytest

    with _pytest.raises(SchemaError):
        sp.query(sort=[{"nonexistent": {"order": "asc"}}])


def test_slow_pool_tag_cleared_by_following_verbs(spark):
    """A slow search's scheduler-pool tag must not throttle the next
    fast verb on the same thread."""
    from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema
    from vearch_spark.space import SLOW_POOL, Space

    schema = SpaceSchema(
        name="pool",
        fields=[
            FieldSpec("field_int", FieldType.INT,
                      index=IndexSpec("field_int", "SCALAR")),
            FieldSpec("v", FieldType.VECTOR, dimension=4,
                      index=IndexSpec("v", "FLAT")),
        ],
    )
    sp = Space(spark, schema)
    sp.upsert([{"_id": "1", "field_int": 1, "v": [1.0, 0.0, 0.0, 0.0]}])
    sc = spark.sparkContext
    sp.search(vector=[0.0] * 4, limit=500)  # slow: tags the thread
    assert sc.getLocalProperty("spark.scheduler.pool") == SLOW_POOL
    sp.query(limit=1)
    assert sc.getLocalProperty("spark.scheduler.pool") is None


def test_string_length_caps(spark):
    """Ingest string-length validation (doc_parse.go:45-46,220-235):
    indexed string fields cap at 1024 bytes, unindexed at 65535;
    string-array elements check individually; multibyte counts BYTES."""
    from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema

    sch = SpaceSchema(
        name="strcap",
        fields=[
            FieldSpec("tag", FieldType.STRING, index=IndexSpec("tag", "SCALAR")),
            FieldSpec("body", FieldType.STRING),
            FieldSpec("tags", FieldType.STRING_ARRAY,
                      index=IndexSpec("tags", "SCALAR")),
        ],
    )
    sp = Space(spark, sch)
    sp.upsert([{"_id": "1", "tag": "x" * 1024, "body": "y" * 65535,
                "tags": ["a" * 1024]}])  # at the caps: accepted
    with pytest.raises(DocumentError, match="tag indexed.*1024"):
        sp.upsert([{"_id": "2", "tag": "x" * 1025}])
    with pytest.raises(DocumentError, match="body length.*65535"):
        sp.upsert([{"_id": "2", "body": "y" * 65536}])
    with pytest.raises(DocumentError, match="tags indexed"):
        sp.upsert([{"_id": "2", "tags": ["ok", "z" * 1025]}])
    with pytest.raises(DocumentError):  # 513 × 2-byte chars = 1026 bytes
        sp.upsert([{"_id": "2", "tag": "é" * 513}])
    assert sp.count() == 1
