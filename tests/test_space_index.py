"""Space ↔ ANN index lifecycle (engine.cc:280-308, 759-768, 1013-1084)."""

import numpy as np
import pytest

from vearch_spark.errors import SearchError
from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, Metric, SpaceSchema
from vearch_spark.space import Space

DIM = 8


def schema(index_type="IVFFLAT", threshold=50):
    return SpaceSchema(
        name="s",
        fields=[
            FieldSpec("field_int", FieldType.INT, index=IndexSpec("field_int", "SCALAR")),
            FieldSpec(
                "field_vector",
                FieldType.VECTOR,
                dimension=DIM,
                index=IndexSpec(
                    "field_vector",
                    index_type,
                    params={"ncentroids": 8, "nprobe": 3, "training_threshold": threshold},
                ),
            ),
        ],
    )


def rows(n, start=0):
    rng = np.random.default_rng(7)
    out = []
    for i in range(start, start + n):
        v = (rng.normal(0, 1, DIM) + (i % 4) * 3).tolist()
        out.append({"_id": str(i), "field_int": i, "field_vector": [float(x) for x in v]})
    return out


def test_below_threshold_stays_brute(spark):
    sp = Space(spark, schema(threshold=100))
    sp.upsert(rows(30))
    sp.build_index("field_vector")
    assert sp.index_state("field_vector") == "UNINDEXED"
    # auto mode still works via brute force (engine.cc:286-293)
    out = sp.search(vector=[0.0] * DIM, limit=3)
    assert out.count() == 3


def test_build_and_auto_use(spark):
    sp = Space(spark, schema(threshold=50))
    sp.upsert(rows(200))
    sp.build_index("field_vector")
    assert sp.index_state("field_vector") == "INDEXED"
    q = [3.0] * DIM
    ann = {r._id for r in sp.search(vector=q, limit=10).collect()}
    exact = {r._id for r in sp.search(vector=q, limit=10, is_brute_search=1).collect()}
    # clustered fixture → pruned search finds most of the exact set
    assert len(ann & exact) >= 7


def test_force_index_without_training_errors(spark):
    sp = Space(spark, schema())
    sp.upsert(rows(30))
    with pytest.raises(SearchError):
        sp.search(vector=[0.0] * DIM, limit=3, is_brute_search=0)


def test_rebuild_after_append_covers_new_docs(spark):
    sp = Space(spark, schema(threshold=50))
    sp.upsert(rows(100))
    sp.build_index("field_vector")
    # new docs appended after the index was built
    sp.upsert(rows(20, start=1000))
    # rebuild (drop_before_rebuild analog) picks them up
    sp.build_index("field_vector")
    target = sp.df.where("_id = '1005'").collect()[0].field_vector
    got = sp.search(vector=[float(x) for x in target], limit=1).collect()
    assert got[0]._id == "1005"


def test_ivfpq_on_space(spark):
    sp = Space(spark, schema(index_type="IVFPQ", threshold=50))
    sp.upsert(rows(200))
    sp.build_index("field_vector", nsubvector=4)
    assert sp.index_state("field_vector") == "INDEXED"
    q = [3.0] * DIM
    out = sp.search(vector=q, limit=5)
    assert out.count() == 5


def test_hnsw_alias_served_by_ivf(spark):
    """HNSW is declared but served by the IVF strategy (documented
    substitution, SURVEY.md §2.4)."""
    sp = Space(spark, schema(index_type="HNSW", threshold=50))
    sp.upsert(rows(120))
    sp.build_index("field_vector")
    assert sp.index_state("field_vector") == "INDEXED"
    assert sp.search(vector=[0.0] * DIM, limit=3).count() == 3
