"""Property-based filter-algebra parity: random filter trees evaluated
by the engine (Catalyst) and by DuckDB over the same parquet must agree
on the exact row multiset. Mirrors the reference's exhaustive filter
module tests (test_module_filter.py) with generative coverage."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vearch_spark.filters import compile_filter

SF_DIR = "/root/testdata/sf0.001"

NUM_FIELDS = {
    "l_quantity": st.integers(1, 50).map(float),
    "l_discount": st.sampled_from([0.0, 0.02, 0.05, 0.07, 0.1]),
    "l_linenumber": st.integers(1, 7),
}
STR_FIELDS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["O", "F"],
}


@st.composite
def condition(draw):
    if draw(st.booleans()):
        field = draw(st.sampled_from(sorted(NUM_FIELDS)))
        op = draw(st.sampled_from([">", ">=", "<", "<=", "=", "!="]))
        value = draw(NUM_FIELDS[field])
    else:
        field = draw(st.sampled_from(sorted(STR_FIELDS)))
        op = draw(st.sampled_from(["IN", "NOT IN"]))
        value = draw(
            st.lists(st.sampled_from(STR_FIELDS[field]), min_size=1, max_size=2, unique=True)
        )
    return {"field": field, "operator": op, "value": value}


@st.composite
def filter_tree(draw, depth=1):
    op = draw(st.sampled_from(["AND", "OR"]))
    n = draw(st.integers(1, 3))
    conds = []
    for _ in range(n):
        if depth > 0 and draw(st.integers(0, 3)) == 0:
            conds.append(draw(filter_tree(depth=depth - 1)))
        else:
            conds.append(draw(condition()))
    return {"operator": op, "conditions": conds}


def to_sql(flt) -> str:
    if "conditions" in flt:
        parts = [to_sql(c) for c in flt["conditions"]]
        return "(" + f" {flt['operator']} ".join(parts) + ")"
    f, op, v = flt["field"], flt["operator"], flt["value"]
    if op == "IN":
        vals = ", ".join(f"'{x}'" for x in v)
        return f"({f} IN ({vals}))"
    if op == "NOT IN":
        vals = ", ".join(f"'{x}'" for x in v)
        return f"(NOT coalesce({f} IN ({vals}), false))"
    if op == "!=":
        return f"(NOT coalesce({f} = {v!r}, false))"
    return f"({f} {op} {v!r})"


@pytest.fixture(scope="module")
def li(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").cache()
    df.count()
    yield df
    # unpersist so the cached plan doesn't shadow parquet scans in other
    # modules' plan-shape assertions
    df.unpersist()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM parquet_scan('{SF_DIR}/lineitem.parquet')"
    )
    return con


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(flt=filter_tree(depth=1))
def test_filter_parity(li, duck, flt):
    spark_rows = sorted(
        (r.l_orderkey, r.l_linenumber)
        for r in li.where(compile_filter(flt)).select("l_orderkey", "l_linenumber").collect()
    )
    duck_rows = sorted(
        (a, b)
        for a, b in duck.execute(
            f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {to_sql(flt)}"
        ).fetchall()
    )
    assert spark_rows == duck_rows
