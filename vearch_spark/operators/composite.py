"""COMPOSITE (multi-column) index semantics.

The reference's composite scalar index (composite_index.h:21-36,
composite_index.cc:372-445) is a RocksDB multi-column key with
**leftmost-prefix matching**: a filter can use the index only if it
binds a prefix of the declared field order, a range condition is legal
only on the *last* bound field, and STRING fields support only
IN/Equal. On Spark the physical index is unnecessary (Catalyst +
parquet stats serve any predicate), so what survives is the
*validation surface*: `validate_composite_filter` accepts or rejects a
condition set under the reference's rules, and `composite_sort_key`
exposes the equivalent physical design hint — a table sorted/bucketed
by the composite columns gives parquet min/max pruning the same
leftmost-prefix behavior the RocksDB key gave.
"""

from __future__ import annotations

from vearch_spark.errors import FilterError
from vearch_spark.filters import RANGE_OPS, TERM_OPS
from vearch_spark.schema import FieldType, SpaceSchema

_EQUALITY_OPS = {"=", "IN"}
# negations cannot be answered by a prefix-key range scan: the matched
# set is the complement of a key range, which the modeled composite
# index (equality prefix + one trailing range, composite_index.cc)
# cannot enumerate — and min/max page pruning gives nothing for them
_NEGATION_OPS = {"!=", "<>", "NOT IN"}


def validate_composite_filter(
    conditions: list[dict],
    index_fields: list[str],
    schema: SpaceSchema | None = None,
) -> list[dict]:
    """Check a flat AND-condition list against a composite index
    declaration, mirroring composite_index.cc:372-445:

    - bound fields must form a leftmost prefix of ``index_fields``;
    - at most one non-equality (range) field, and it must be the LAST
      bound field;
    - STRING fields may only use IN / = (no ranges).

    Returns the conditions ordered by index position.
    """
    by_field: dict[str, list[dict]] = {}
    for cond in conditions:
        fname = cond.get("field")
        if fname not in index_fields:
            raise FilterError(
                f"field {fname!r} is not part of composite index {index_fields}"
            )
        by_field.setdefault(fname, []).append(cond)

    bound = [f for f in index_fields if f in by_field]
    # leftmost-prefix: bound fields must be index_fields[:len(bound)]
    if bound != index_fields[: len(bound)]:
        raise FilterError(
            f"composite index requires a leftmost prefix of {index_fields}, "
            f"got {sorted(by_field)}"
        )

    ordered: list[dict] = []
    for pos, fname in enumerate(bound):
        is_last = pos == len(bound) - 1
        for cond in by_field[fname]:
            op = str(cond["operator"]).upper().strip()
            if op not in RANGE_OPS | TERM_OPS:
                raise FilterError(f"unsupported operator {op!r} in composite filter")
            if op in _NEGATION_OPS:
                raise FilterError(
                    f"composite index cannot serve negation {op!r} on "
                    f"{fname!r} (a prefix-key scan answers ranges, not "
                    "complements)"
                )
            is_equality = op in _EQUALITY_OPS
            if schema is not None and schema.field(fname).type is FieldType.STRING:
                if not is_equality:
                    # strings support only IN/Equal (composite_index.h:30-33)
                    raise FilterError(
                        f"composite index string field {fname!r} supports only IN/="
                    )
            if not is_equality and not is_last:
                # range allowed only on the last bound field
                raise FilterError(
                    f"range condition on {fname!r} must be the last bound "
                    f"field of composite index {index_fields}"
                )
            ordered.append(cond)
    if not ordered:
        raise FilterError("composite filter requires at least one condition")
    return ordered


def composite_sort_key(index_fields: list[str]) -> list[str]:
    """The physical design hint replacing the RocksDB composite key: at
    scale, write the table ``sortWithinPartitions(*fields)`` (or
    bucketed by the first field) so parquet min/max page stats prune
    leftmost-prefix predicates exactly like the composite key scan."""
    return list(index_fields)
