"""Composite-index validation parity (composite_index.cc:372-445)."""

import pytest

from vearch_spark.errors import FilterError
from vearch_spark.operators.composite import composite_sort_key, validate_composite_filter
from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, SpaceSchema

IDX = ["a", "b", "c"]


def schema():
    return SpaceSchema(
        name="t",
        fields=[
            FieldSpec("a", FieldType.INT, index=IndexSpec("a", "SCALAR")),
            FieldSpec("b", FieldType.STRING, index=IndexSpec("b", "SCALAR")),
            FieldSpec("c", FieldType.DOUBLE, index=IndexSpec("c", "SCALAR")),
        ],
    )


def c(f, op, v):
    return {"field": f, "operator": op, "value": v}


def test_full_prefix_with_trailing_range():
    out = validate_composite_filter(
        [c("a", "=", 1), c("b", "IN", ["x"]), c("c", ">", 0.5)], IDX, schema()
    )
    assert [x["field"] for x in out] == ["a", "b", "c"]


def test_prefix_only_ok():
    validate_composite_filter([c("a", "=", 1)], IDX)
    validate_composite_filter([c("a", "=", 1), c("b", "IN", ["x"])], IDX, schema())


def test_gap_in_prefix_rejected():
    with pytest.raises(FilterError):
        validate_composite_filter([c("a", "=", 1), c("c", "=", 2.0)], IDX)
    with pytest.raises(FilterError):
        validate_composite_filter([c("b", "IN", ["x"])], IDX)


def test_range_not_last_rejected():
    with pytest.raises(FilterError):
        validate_composite_filter([c("a", ">", 1), c("b", "IN", ["x"])], IDX, schema())


def test_string_range_rejected():
    with pytest.raises(FilterError):
        validate_composite_filter(
            [c("a", "=", 1), c("b", ">", "x"), c("c", "=", 1.0)], IDX, schema()
        )


def test_unknown_field_rejected():
    with pytest.raises(FilterError):
        validate_composite_filter([c("z", "=", 1)], IDX)


def test_sort_key():
    assert composite_sort_key(IDX) == IDX


def test_negation_ops_rejected():
    """A prefix-key scan answers ranges, not complements — '!='/'NOT IN'
    cannot be served by the composite index."""
    for op, val in (("!=", 1), ("<>", 1), ("NOT IN", ["x"])):
        with pytest.raises(FilterError):
            validate_composite_filter(
                [{"field": "a", "operator": op, "value": val}], ["a", "b"]
            )
