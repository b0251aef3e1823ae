"""Bucketed durable write path — the 100 TB write-side posture.

The reference updates in place per routed shard (Engine::AddOrUpdate
engine.cc:697-785); the Spark stand-in must not rewrite the whole table
for a point write. These tests pin the IO contract: a 1-row update
rewrites exactly the bucket holding that key, untouched buckets keep
serving from their old version directories, and reads after reopen see
one consistent table.
"""

import os

import pytest
from pyspark.sql import functions as F

from vearch_spark.schema import SpaceSchema
from vearch_spark.space import Space

N_BUCKETS = 8


def make_schema(with_rule: bool = False) -> SpaceSchema:
    spec = {
        "name": "bucketed",
        "fields": [
            {"name": "field_int", "type": "integer", "index": {"type": "SCALAR"}},
            {"name": "field_string", "type": "string", "index": {"type": "SCALAR"}},
        ],
    }
    if with_rule:
        spec["fields"].append(
            {"name": "field_date", "type": "date", "index": {"type": "SCALAR"}}
        )
        spec["partition_rule"] = {
            "type": "RANGE",
            "field": "field_date",
            "ranges": [
                {"name": "p0", "value": "2020-06-01"},
                {"name": "p1", "value": "2021-01-01"},
            ],
        }
    return SpaceSchema.from_json(spec)


def seed_rows(n=64):
    return [
        {"_id": f"d{i}", "field_int": i, "field_string": f"s{i % 7}"} for i in range(n)
    ]


def written_buckets(space: Space, version: int) -> list[str]:
    vdir = space._version_dir(version)
    if not os.path.isdir(vdir):
        return []
    return sorted(d for d in os.listdir(vdir) if d.startswith("b"))


@pytest.fixture()
def space(spark, tmp_path):
    sp = Space(spark, make_schema(), path=str(tmp_path / "sp"), n_buckets=N_BUCKETS)
    sp.upsert(seed_rows())
    return sp


def test_initial_load_writes_all_buckets(space):
    man = space._manifest
    assert man["version"] == 1
    assert len(man["buckets"]) == N_BUCKETS  # 64 ids cover all 8 buckets
    assert space.count() == 64


def test_one_row_update_rewrites_one_bucket(space):
    """The verdict's scale-killer check: a point write must touch
    exactly one bucket directory, never the table."""
    v0 = space._manifest["version"]
    space.partial_update("d3", {"field_int": 999})
    man = space._manifest
    assert man["version"] == v0 + 1
    assert len(written_buckets(space, man["version"])) == 1
    # the other buckets still point at the original version
    stale = [v for v in man["buckets"].values() if v == v0]
    assert len(stale) == N_BUCKETS - 1
    got = space.get(["d3"], output_fields=["_id", "field_int"]).collect()
    assert got[0]["field_int"] == 999
    assert space.count() == 64


def test_small_upsert_rewrites_only_touched_buckets(space):
    v0 = space._manifest["version"]
    space.upsert([{"_id": "d1", "field_int": -1}, {"_id": "new1", "field_int": 1000}])
    man = space._manifest
    touched = written_buckets(space, man["version"])
    assert 1 <= len(touched) <= 2  # at most one bucket per distinct id
    assert sum(1 for v in man["buckets"].values() if v == v0) >= N_BUCKETS - 2
    assert space.count() == 65
    rows = {
        r["_id"]: r["field_int"]
        for r in space.get(["d1", "new1"], output_fields=["_id", "field_int"]).collect()
    }
    assert rows == {"d1": -1, "new1": 1000}


def test_seq_stability_and_monotonicity_across_commits(space):
    seq_before = {
        r["_id"]: r["_seq"]
        for r in space.df.select("_id", "_seq").collect()
    }
    space.upsert([{"_id": "d5", "field_int": 50}, {"_id": "z_new", "field_int": 1}])
    seq_after = {
        r["_id"]: r["_seq"] for r in space.df.select("_id", "_seq").collect()
    }
    assert seq_after["d5"] == seq_before["d5"]  # docid stable on update
    assert seq_after["z_new"] > max(seq_before.values())  # fresh seq above all


def test_delete_rewrites_only_touched_buckets(space):
    n = space.delete(["d10", "d11"])
    assert n == 2
    man = space._manifest
    assert 1 <= len(written_buckets(space, man["version"])) <= 2
    assert space.count() == 62


def test_delete_by_query_bounded_rewrite(space):
    doomed = space.delete_by_query(
        {"operator": "AND", "conditions": [{"field": "field_int", "operator": "<", "value": 4}]}
    )
    assert sorted(doomed) == ["d0", "d1", "d2", "d3"]
    assert space.count() == 60
    assert len(written_buckets(space, space._manifest["version"])) <= 4


def test_no_match_delete_skips_commit(space):
    v0 = space._manifest["version"]
    space.delete_by_query(
        {"operator": "AND", "conditions": [{"field": "field_int", "operator": ">", "value": 10**9}]}
    )
    assert space._manifest["version"] == v0  # nothing rewritten at all


def test_reopen_sees_merged_state_and_continues_seq(spark, space, tmp_path):
    space.partial_update("d7", {"field_string": "patched"})
    hw = space._max_seq
    sp2 = Space(spark, make_schema(), path=space.path)
    assert sp2.n_buckets == N_BUCKETS  # manifest wins over ctor default
    assert sp2.count() == 64
    assert sp2._max_seq == hw
    got = sp2.get(["d7"], output_fields=["_id", "field_string"]).collect()
    assert got[0]["field_string"] == "patched"
    sp2.upsert([{"_id": "post_reopen", "field_int": 1}])
    seqs = dict(sp2.df.select("_id", "_seq").collect())
    assert seqs["post_reopen"] == max(seqs.values())


def test_vacuum_removes_dead_versions(space):
    for i in range(3):
        space.partial_update("d3", {"field_int": i})
    removed = space.vacuum()
    assert removed >= 1
    assert space.count() == 64  # live data untouched
    live = {int(v) for v in space._manifest["buckets"].values()}
    for name in os.listdir(space.path):
        if name.startswith("v") and name[1:].isdigit():
            assert int(name[1:]) in live or int(name[1:]) == space._manifest["version"]


def test_bucketed_with_partition_rule_prunes_and_rewrites(spark, tmp_path):
    """Range rule nests a physical _partition_name level inside each
    bucket: partition_names queries prune directories AND point writes
    stay bucket-bounded."""
    import datetime as dt

    from vearch_spark.plans import explain as X

    sp = Space(spark, make_schema(with_rule=True), path=str(tmp_path / "pr"), n_buckets=4)
    rows = [
        {
            "_id": f"d{i}",
            "field_int": i,
            "field_string": "x",
            "field_date": dt.datetime(2020, 3, 1) if i % 2 == 0 else dt.datetime(2020, 9, 1),
        }
        for i in range(32)
    ]
    sp.upsert(rows)
    out = sp.query(partition_names=["p0"], limit=100)
    assert out.count() == 16
    # physical partition pruning: the predicate lands in PartitionFilters
    pruned = sp.df.where(F.col("_partition_name") == "p0")
    plan = X.formatted_plan(pruned)
    assert "PartitionFilters" in plan and "_partition_name" in plan.split("PartitionFilters", 1)[1][:200]
    v0 = sp._manifest["version"]
    sp.partial_update("d4", {"field_int": -4})
    assert len(written_buckets(sp, sp._manifest["version"])) == 1
    assert sp.query(partition_names=["p0"], limit=100).count() == 16
    got = sp.get(["d4"], output_fields=["_id", "field_int"]).collect()
    assert got[0]["field_int"] == -4


def test_time_travel_snapshots(spark, tmp_path):
    """Every commit archives its manifest as a time-travel point:
    as_of(v) reads the table exactly as committed at v, sharing
    untouched-bucket files with the current version."""
    from vearch_spark.errors import DocumentError

    sp = Space(spark, make_schema(), path=str(tmp_path / "tt"), n_buckets=N_BUCKETS)
    sp.upsert(seed_rows(10))
    v1 = sp._manifest["version"]
    sp.upsert([{"_id": "d3", "field_int": 999, "field_string": "zz"}])
    sp.delete(["d0", "d1"])
    assert sp.count() == 8
    assert sp.snapshots() == [v1, v1 + 1, v1 + 2]

    snap = sp.as_of(v1)
    assert snap.count() == 10
    assert snap.where("_id = 'd3'").collect()[0].field_int == 3  # pre-update
    assert sp.as_of(v1 + 1).where("_id = 'd3'").collect()[0].field_int == 999
    assert sp.as_of(v1 + 2).count() == 8

    with pytest.raises(DocumentError, match="unknown snapshot"):
        sp.as_of(99)
    # vacuum reclaims superseded files AND prunes their archives, so
    # snapshots() only ever advertises readable versions
    sp.upsert(seed_rows(64))  # full overwrite supersedes every bucket
    removed = sp.vacuum()
    assert removed >= 1
    assert sp.snapshots() == [sp._manifest["version"]]
    with pytest.raises(DocumentError, match="unknown snapshot"):
        sp.as_of(v1).count()
    assert sp.count() == 64


def test_get_by_ids_prunes_to_touched_buckets(space):
    """A point get opens ONLY the bucket dirs its ids hash to (the
    reference routes a get to its hash slot, doc_http.go:584-586) —
    never the whole multi-root table."""
    out = space.get(["d7"])
    assert [r._id for r in out.collect()] == ["d7"]
    roots = {f.split("/b")[-1].split("/")[0] for f in out.inputFiles()}
    touched = space._buckets_of_ids(["d7"])
    assert len(touched) == 1
    assert roots == {str(touched[0])}  # one bucket dir, not N_BUCKETS
    # a missing id in an existing bucket still returns empty cleanly
    assert space.get(["no_such_id"]).count() == 0


def test_concurrent_commit_cas(spark, tmp_path):
    """Two writers on one space path: the manifest commit is an
    optimistic CAS under the commit lock — interleaved commits
    serialize or the loser fails with ConcurrentWriteError, and the
    winner's committed data survives untouched (no version-dir
    clobber: the loser stages its write privately and cleans it up).
    The reference serializes this through raft
    (internal/ps/storage/raftstore/)."""
    from vearch_spark.errors import ConcurrentWriteError

    path = str(tmp_path / "cc")
    sp1 = Space(spark, make_schema(), path=path, n_buckets=4)
    sp1.upsert(seed_rows(16))
    sp2 = Space(spark, make_schema(), path=path)  # second writer attaches

    sp1.upsert([{"_id": "d1", "field_int": 1000, "field_string": "w1"}])
    with pytest.raises(ConcurrentWriteError):
        # sp2's manifest is stale (pre-sp1-commit): its commit must
        # lose cleanly, not overwrite sp1's
        sp2.upsert([{"_id": "d2", "field_int": 2000, "field_string": "w2"}])

    # winner's commit intact, loser left no staging orphan
    sp3 = Space(spark, make_schema(), path=path)
    got = {r._id: r.field_int for r in sp3.df.collect()}
    assert got["d1"] == 1000 and got["d2"] == 2
    assert not [d for d in os.listdir(path) if d.startswith("_staging_")]

    # the documented retry: reload (fresh attach) then re-apply — wins
    sp4 = Space(spark, make_schema(), path=path)
    sp4.upsert([{"_id": "d2", "field_int": 2000, "field_string": "w2"}])
    sp5 = Space(spark, make_schema(), path=path)
    assert {r.field_int for r in sp5.df.where(F.col("_id") == "d2").collect()} == {2000}


def test_vacuum_reclaims_staging_orphans(spark, tmp_path):
    """A writer that crashes before its manifest CAS leaves a
    commit-private _staging_* dir; vacuum removes it once past the
    grace window — but must NOT touch a YOUNG staging dir, which may
    belong to a live concurrent commit between its data write and its
    commit lock."""
    import time

    sp = Space(spark, make_schema(), path=str(tmp_path / "vs"), n_buckets=4)
    sp.upsert(seed_rows(8))
    old = os.path.join(sp.path, "_staging_deadbeef")
    young = os.path.join(sp.path, "_staging_inflight")
    os.makedirs(old)
    os.makedirs(young)
    stale = time.time() - 7200  # crashed hours ago
    os.utime(old, (stale, stale))
    sp.upsert([{"_id": "d0", "field_int": 99, "field_string": "x"}])
    sp.vacuum()
    assert not os.path.exists(old)
    assert os.path.exists(young)  # live commit's staging untouched
    os.rmdir(young)
    assert {r.field_int for r in sp.df.where(F.col("_id") == "d0").collect()} == {99}
