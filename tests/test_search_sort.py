"""Search-verb sort + pagination (verdict r01 gap #1/#2).

Reference: the search request carries a Sort list
(search_doc.go:71-94), the router re-sorts the merged top-k by it with
typed missing-last comparators (sortorder/sort.go:23-150,
doc_service.go:172-187) and slices page_size/page_num out of the final
ordered list (client.go:888-904). Sort applies regardless of ranker
(fusion included).
"""

import pytest

from vearch_spark import api
from vearch_spark.errors import SchemaError
from vearch_spark.schema import SpaceSchema
from vearch_spark.space import Space

DIM = 4


def make_space(spark) -> Space:
    schema = SpaceSchema.from_json(
        {
            "name": "s",
            "fields": [
                {"name": "price", "type": "float", "index": {"type": "SCALAR"}},
                {"name": "tag", "type": "string", "index": {"type": "SCALAR"}},
                {
                    "name": "vec",
                    "type": "vector",
                    "dimension": DIM,
                    "index": {"type": "FLAT", "params": {"metric_type": "L2"}},
                },
                {
                    "name": "vec2",
                    "type": "vector",
                    "dimension": DIM,
                    "index": {"type": "FLAT", "params": {"metric_type": "L2"}},
                },
            ],
        }
    )
    sp = Space(spark, schema)
    rows = []
    for i in range(20):
        rows.append(
            {
                "_id": f"d{i:02d}",
                # price missing on two docs → they must sort LAST
                "price": None if i in (3, 7) else float((i * 31) % 13),
                "tag": f"t{i % 3}",
                "vec": [float(i) / 20.0] * DIM,
                "vec2": [1.0 - float(i) / 20.0] * DIM,
            }
        )
    sp.upsert(rows)
    return sp


@pytest.fixture(scope="module")
def space(spark):
    return make_space(spark)


def top_ids_by_score(space, k):
    hits = space.search(vector=[0.0] * DIM, vector_field="vec", limit=k).collect()
    return [r["_id"] for r in hits]


def test_sort_reorders_topk_without_changing_membership(space):
    base = set(top_ids_by_score(space, 10))
    hits = space.search(
        vector=[0.0] * DIM,
        vector_field="vec",
        limit=10,
        sort=[{"price": {"order": "desc"}}],
    ).collect()
    assert {r["_id"] for r in hits} == base  # candidates = score top-k
    prices = [r["price"] for r in hits]
    present = [p for p in prices if p is not None]
    assert present == sorted(present, reverse=True)
    # missing-last: NULL prices sink to the end under desc too
    assert all(p is not None for p in prices[: len(present)])


def test_sort_asc_missing_last(space):
    hits = space.search(
        vector=[0.0] * DIM,
        vector_field="vec",
        limit=10,
        sort=[{"price": {"order": "asc"}}],
    ).collect()
    prices = [r["price"] for r in hits]
    present = [p for p in prices if p is not None]
    assert present == sorted(present)
    assert prices[len(present):] == [None] * (len(prices) - len(present))


def test_sort_field_autoprojected_into_explicit_fields(space):
    hits = space.search(
        vector=[0.0] * DIM,
        vector_field="vec",
        limit=5,
        output_fields=["tag"],
        sort=[{"price": {"order": "asc"}}],
    )
    # price rides along even though the user asked only for tag
    # (doc_query.go:1546-1549 sort-field auto-projection)
    assert "price" in hits.columns and "tag" in hits.columns


def test_search_page_slicing(space):
    ordered = space.search(
        vector=[0.0] * DIM, vector_field="vec", limit=12,
        sort=[{"price": {"order": "asc"}}],
    ).collect()
    page2 = space.search(
        vector=[0.0] * DIM, vector_field="vec", limit=12,
        sort=[{"price": {"order": "asc"}}],
        page_size=5, page_num=2,
    ).collect()
    assert [r["_id"] for r in page2] == [r["_id"] for r in ordered[5:10]]
    # a page beyond the merged topN is short/empty (client.go:888-904)
    page4 = space.search(
        vector=[0.0] * DIM, vector_field="vec", limit=12,
        sort=[{"price": {"order": "asc"}}],
        page_size=5, page_num=4,
    ).collect()
    assert len(page4) == 0


def test_page_without_sort_slices_score_order(space):
    base = top_ids_by_score(space, 12)
    page = space.search(
        vector=[0.0] * DIM, vector_field="vec", limit=12, page_size=4, page_num=2
    ).collect()
    assert [r["_id"] for r in page] == base[4:8]


def test_fusion_sort_applies_post_merge(space):
    from vearch_spark.operators.fusion import VectorQuery

    fused = space.search(
        vectors=[
            VectorQuery("vec", [0.0] * DIM),
            VectorQuery("vec2", [0.0] * DIM),
        ],
        limit=8,
        sort=[{"price": {"order": "desc"}}],
    ).collect()
    assert len(fused) == 8
    prices = [r["price"] for r in fused]
    present = [p for p in prices if p is not None]
    assert present == sorted(present, reverse=True)


def test_unknown_sort_field_rejected(space):
    with pytest.raises(SchemaError):
        space.search(
            vector=[0.0] * DIM, vector_field="vec", limit=5, sort=[{"nope": "asc"}]
        )


def test_api_search_verb_carries_sort_and_page(space):
    hits = api.search(
        space,
        {
            "vectors": [{"field": "vec", "feature": [0.0] * DIM}],
            "limit": 10,
            "sort": [{"price": {"order": "asc"}}, {"_id": {"order": "asc"}}],
            "page_size": 3,
            "page_num": 1,
        },
    ).collect()
    assert len(hits) == 3
    prices = [r["price"] for r in hits]
    assert prices == sorted(prices)


def test_sorted_page_validates_page_size_and_bounds(spark):
    from vearch_spark.errors import SearchError
    from vearch_spark.operators.sort import sorted_page

    df = spark.createDataFrame([(i, i) for i in range(10)], "_id int, v int")
    with pytest.raises(SearchError, match="page_size"):
        sorted_page(df, [("v", True)], page_size=0, page_num=1)
    with pytest.raises(SearchError, match="offset"):
        sorted_page(df, [("v", True)], offset=-3)
    with pytest.raises(SearchError, match="limit"):
        sorted_page(df, [("v", True)], limit=0)


def test_operator_level_metric_mismatch_rejected(spark):
    """multi_vector_search is a public operator — it must reject a
    caller metric that contradicts the schema's field metric at the
    operator level too, not only behind Space.search."""
    from vearch_spark.errors import SearchError
    from vearch_spark.operators.fusion import VectorQuery, multi_vector_search
    from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema

    sch = SpaceSchema(
        name="ipfields",
        fields=[
            FieldSpec("a", FieldType.VECTOR, dimension=2, metric="InnerProduct",
                      index=IndexSpec("a", "FLAT")),
            FieldSpec("b", FieldType.VECTOR, dimension=2, metric="InnerProduct",
                      index=IndexSpec("b", "FLAT")),
        ],
    )
    df = spark.createDataFrame(
        [("1", [1.0, 0.0], [0.0, 1.0])],
        "_id string, a array<float>, b array<float>",
    )
    qs = [VectorQuery("a", [1.0, 0.0]), VectorQuery("b", [1.0, 0.0])]
    with pytest.raises(SearchError, match="metric"):
        multi_vector_search(df, qs, limit=1, metric="L2", schema=sch)
    # matching metric passes
    out = multi_vector_search(df, qs, limit=1, metric="InnerProduct", schema=sch)
    assert out.count() == 1
