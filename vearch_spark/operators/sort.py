"""Typed multi-field sort + limit/offset/page pagination.

Reference: sort param parse internal/ps/engine/sortorder/parse.go:27-100;
typed comparators with missing→±∞ sortorder/sort.go:23-150 (a missing
value compares as +∞ under asc and −∞ under desc, i.e. missing sorts
LAST either way); router post-merge page slicing client.go:888-904
(search) / client.go:1135-1151 (query).

Spark-first: ``ORDER BY`` with ``asc_nulls_last`` / ``desc_nulls_last``
reproduces the ±∞ rule; pagination is ``offset``/``limit`` which plan
into the limit pushdown / TakeOrderedAndProject machinery, or a
row_number window when a rank column must be materialized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from vearch_spark.errors import SearchError
from vearch_spark.schema import ID_FIELD


def parse_sort(sort: list[dict | str] | None) -> list[tuple[str, bool]]:
    """Parse the reference's sort syntax: ``[{"field": {"order":
    "asc"|"desc"}}, ...]`` or bare field names (default desc for
    ``_score``, asc otherwise — sortorder/parse.go:25-46).

    Returns [(field, ascending)].
    """
    out: list[tuple[str, bool]] = []
    for item in sort or []:
        if isinstance(item, str):
            out.append((item, item != "_score"))
            continue
        if not isinstance(item, dict) or len(item) != 1:
            raise SearchError(f"invalid sort item: {item!r}")
        fieldname, spec = next(iter(item.items()))
        order = (spec or {}).get("order", "asc") if isinstance(spec, dict) else str(spec)
        if str(order).lower() not in {"asc", "desc"}:
            raise SearchError(f"sort order must be asc|desc, got {order!r}")
        out.append((fieldname, str(order).lower() == "asc"))
    return out


def sort_columns(
    sort: list[tuple[str, bool]],
    tie_break: str | None = ID_FIELD,
) -> list[Column]:
    """Build ORDER BY columns with missing-last (±∞) semantics."""
    cols = []
    for name, asc in sort:
        c = F.col(name)
        cols.append(c.asc_nulls_last() if asc else c.desc_nulls_last())
    if tie_break and tie_break not in {n for n, _ in sort}:
        cols.append(F.col(tie_break).asc())
    return cols


def sorted_page(
    df: DataFrame,
    sort: list[tuple[str, bool]],
    limit: int | None = None,
    offset: int = 0,
    page_size: int | None = None,
    page_num: int | None = None,
    tie_break: str | None = ID_FIELD,
) -> DataFrame:
    """Sort + slice. ``page_size``/``page_num`` override offset/limit
    ((page_num-1)*page_size, client.go:888-904)."""
    if page_size is not None:
        if page_size < 1:
            raise SearchError(f"page_size must be >= 1, got {page_size}")
        if page_num is None or page_num < 1:
            raise SearchError("page_num must be >= 1 when page_size is set")
        offset = (page_num - 1) * page_size
        limit = page_size
    if offset < 0:
        raise SearchError(f"offset must be >= 0, got {offset}")
    if limit is not None and limit < 1:
        raise SearchError(f"limit must be positive, got {limit}")
    out = df.orderBy(*sort_columns(sort, tie_break))
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out
