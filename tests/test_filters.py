import pytest
from pyspark.sql import functions as F

from vearch_spark.errors import FilterError, SchemaError
from vearch_spark.filters import compile_filter
from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, 10, 1.5, "red", ["a", "b"]),
            (2, 20, 2.5, "blue", ["b", "c"]),
            (3, 30, 3.5, "red", ["d"]),
            (4, 40, 4.5, None, None),
        ],
        "id int, num int, d double, color string, tags array<string>",
    )


def idx(name):
    return IndexSpec(name=name, index_type="SCALAR")


@pytest.fixture(scope="module")
def schema():
    return SpaceSchema(
        name="t",
        fields=[
            FieldSpec("num", FieldType.INT, index=idx("num")),
            FieldSpec("d", FieldType.DOUBLE, index=idx("d")),
            FieldSpec("color", FieldType.STRING, index=idx("color")),
            FieldSpec("tags", FieldType.STRING_ARRAY, index=idx("tags")),
            FieldSpec("free", FieldType.INT),  # unindexed
        ],
    )


def ids(df, flt, schema=None):
    pred = compile_filter(flt, schema)
    return sorted(r.id for r in df.where(pred).collect())


def test_range_ops(df):
    assert ids(df, {"operator": "AND", "conditions": [{"field": "num", "operator": ">", "value": 15}]}) == [2, 3, 4]
    assert ids(df, {"operator": "AND", "conditions": [{"field": "num", "operator": ">=", "value": 20}, {"field": "num", "operator": "<", "value": 40}]}) == [2, 3]
    assert ids(df, {"operator": "AND", "conditions": [{"field": "num", "operator": "=", "value": 30}]}) == [3]


def test_neq_complement(df):
    # != is the complement of the matched set; NULLs are in the complement
    assert ids(df, {"operator": "AND", "conditions": [{"field": "color", "operator": "!=", "value": "red"}]}, None) == [2, 4]


def test_or_union(df):
    flt = {"operator": "OR", "conditions": [
        {"field": "num", "operator": "=", "value": 10},
        {"field": "num", "operator": "=", "value": 40},
    ]}
    assert ids(df, flt) == [1, 4]


def test_term_in_string(df):
    assert ids(df, {"operator": "AND", "conditions": [{"field": "color", "operator": "IN", "value": ["red"]}]}) == [1, 3]
    # NOT IN includes nulls (complement semantics)
    assert ids(df, {"operator": "AND", "conditions": [{"field": "color", "operator": "NOT IN", "value": ["red"]}]}) == [2, 4]


def test_term_in_string_array(df, schema):
    flt = {"operator": "AND", "conditions": [{"field": "tags", "operator": "IN", "value": ["b"]}]}
    assert ids(df, flt, schema) == [1, 2]
    flt = {"operator": "AND", "conditions": [{"field": "tags", "operator": "NOT IN", "value": ["b"]}]}
    assert ids(df, flt, schema) == [3, 4]


def test_numeric_in_rejected(schema):
    # doc_query.go:1160-1167
    with pytest.raises(FilterError):
        compile_filter({"operator": "AND", "conditions": [{"field": "num", "operator": "IN", "value": [1]}]}, schema)


def test_unindexed_field_rejected(schema):
    # doc_query.go:1169-1171
    with pytest.raises(FilterError):
        compile_filter({"operator": "AND", "conditions": [{"field": "free", "operator": ">", "value": 1}]}, schema)


def test_unknown_field_rejected(schema):
    with pytest.raises(SchemaError):
        compile_filter({"operator": "AND", "conditions": [{"field": "nope", "operator": ">", "value": 1}]}, schema)


def test_range_on_string_rejected(schema):
    with pytest.raises(FilterError):
        compile_filter({"operator": "AND", "conditions": [{"field": "color", "operator": ">", "value": "a"}]}, schema)


def test_nested_filters(df):
    flt = {"operator": "OR", "conditions": [
        {"operator": "AND", "conditions": [
            {"field": "num", "operator": ">", "value": 5},
            {"field": "num", "operator": "<", "value": 15},
        ]},
        {"field": "num", "operator": "=", "value": 40},
    ]}
    assert ids(df, flt) == [1, 4]


def test_bad_operator(df):
    with pytest.raises(FilterError):
        compile_filter({"operator": "AND", "conditions": [{"field": "num", "operator": "~", "value": 1}]})
    with pytest.raises(FilterError):
        compile_filter({"operator": "XOR", "conditions": [{"field": "num", "operator": ">", "value": 1}]})


def test_date_literal_coercion(spark):
    """DATE literals: ints are epoch seconds, strings parsed
    (doc_query.go:710-724)."""
    from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema

    dschema = SpaceSchema(
        name="d",
        fields=[FieldSpec("ts", FieldType.DATE, index=IndexSpec("ts", "SCALAR"))],
    )
    df = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00"), (2, "2020-06-01 00:00:00"), (3, "2021-01-01 00:00:00")],
        "id int, raw string",
    ).select("id", F.to_timestamp("raw").alias("ts"))

    flt_str = {"operator": "AND", "conditions": [{"field": "ts", "operator": ">=", "value": "2020-06-01"}]}
    got_str = sorted(r.id for r in df.where(compile_filter(flt_str, dschema)).collect())
    assert got_str == [2, 3]

    epoch_s = 1590969600  # 2020-06-01T00:00:00Z
    flt_int = {"operator": "AND", "conditions": [{"field": "ts", "operator": ">=", "value": epoch_s}]}
    got_int = sorted(r.id for r in df.where(compile_filter(flt_int, dschema)).collect())
    assert got_int == got_str


def test_search_meta(spark):
    """total + best score metadata (response.cc:256-312)."""
    from vearch_spark.operators.topk import search_meta

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)], "id int, v array<float>"
    )
    row = search_meta(df, "v", [0.0, 0.0], metric="L2", flt=F.col("id") >= 5).collect()[0]
    assert row.total == 5
    assert row.best_score == 25.0  # squared distance of id=5


def test_interval_merge_semantics(df):
    """Multiple conditions on one field are interval-merged per AND/OR
    (parseRangeForOr doc_query.go:368-705; AND = intersection, OR =
    union, scalar_index_manager.cc:1183-1193). Catalyst reproduces the
    canonicalized semantics; these pin them."""
    # AND of two ranges on one field = intersection [20, 30]
    both = {"operator": "AND", "conditions": [
        {"field": "num", "operator": ">=", "value": 20},
        {"field": "num", "operator": "<=", "value": 30},
    ]}
    assert sorted(r.num for r in df.where(compile_filter(both)).collect()) == [20, 30]
    # contradictory AND canonicalizes to the empty range -> zero hits
    empty = {"operator": "AND", "conditions": [
        {"field": "num", "operator": ">", "value": 30},
        {"field": "num", "operator": "<", "value": 20},
    ]}
    assert df.where(compile_filter(empty)).count() == 0
    # OR of disjoint ranges = union of the two intervals
    disj = {"operator": "OR", "conditions": [
        {"field": "num", "operator": "<", "value": 15},
        {"field": "num", "operator": ">", "value": 35},
    ]}
    assert sorted(r.num for r in df.where(compile_filter(disj)).collect()) == [10, 40]
    # != is the complement (IsUnion=NOT IN, doc_query.go:579-585)
    ne = {"operator": "AND", "conditions": [{"field": "num", "operator": "!=", "value": 20}]}
    assert sorted(r.num for r in df.where(compile_filter(ne)).collect()) == [10, 30, 40]


def test_unparseable_date_literal_rejected():
    """cast.ToTimeE errors at parse time in the reference; a literal
    that to_timestamp would NULL-degrade must raise FilterError, not
    silently match all ('!=') / none ('=') of the table."""
    dschema = SpaceSchema(
        name="d",
        fields=[FieldSpec("ts", FieldType.DATE, index=IndexSpec("ts", "SCALAR"))],
    )
    for op in ("=", "!=", ">"):
        flt = {
            "operator": "AND",
            "conditions": [{"field": "ts", "operator": op, "value": "2024-13-45"}],
        }
        with pytest.raises(FilterError, match="invalid date literal"):
            compile_filter(flt, dschema)
