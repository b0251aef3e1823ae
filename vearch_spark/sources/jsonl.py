"""JSON-lines bulk ingest — the distributed analog of the reference's
HTTP bulk upsert body (one JSON document per line, doc_http.go:467 →
doc_parse.go:540 MapDocument).

Design points for scale:

- the space schema supplies an explicit StructType — never
  ``inferSchema`` (an inference pass doubles the 100 TB scan);
- parse-level validation is distributed, not driver-side: a malformed
  line or a line with a field the schema doesn't know is surfaced
  per-row, mirroring the reference's per-document parse rejects
  (``doc_parse.go:56-118`` fails a doc on unknown/ill-typed fields);
- vector dimension checks ride the same pass (``size(vec) = dim``).

``read_jsonl`` returns the valid-docs DataFrame plus a rejects
DataFrame (line + reason) so callers choose strict (raise on any
reject, the router's behavior) or permissive (log and load the rest —
what a 100 TB backfill usually wants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vearch_spark.errors import DocumentError
from vearch_spark.schema import ID_FIELD, SpaceSchema, expected_vector_len


def read_jsonl(
    spark: SparkSession, path: str, schema: SpaceSchema
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL document file against a space schema.

    Returns ``(docs, rejects)``: ``docs`` has ``_id`` (string-coerced)
    plus every schema field, ready for :meth:`Space.upsert`;
    ``rejects`` has ``(line, reason)`` for rows that fail parsing,
    carry unknown fields, or break a vector dimension.
    """
    struct = schema.to_struct_type(include_system=False)
    known = {ID_FIELD, *[f.name for f in schema.fields]}

    raw = spark.read.text(path).withColumnRenamed("value", "_line")
    # distributed key audit: json_object_keys is a JVM expression, so
    # the unknown-field reject happens on executors at scan speed
    keys = F.json_object_keys(F.col("_line"))
    unknown = F.array_except(keys, F.array(*[F.lit(k) for k in sorted(known)]))
    parsed = raw.select(
        "_line",
        F.get_json_object(F.col("_line"), f"$.{ID_FIELD}").alias(ID_FIELD),
        F.from_json(F.col("_line"), struct).alias("_doc"),
        F.when(keys.isNull(), F.lit("malformed JSON"))
        .when(F.size(unknown) > 0, F.concat(F.lit("unknown fields: "), F.concat_ws(",", unknown)))
        .otherwise(F.lit(None))
        .alias("_reason"),
    )
    for f in schema.vector_fields:
        # the same contract Space.upsert enforces: d floats, or d/8
        # packed bytes for Hamming-space fields — checking the raw
        # dimension would reject every VALID binary-vector document
        want = expected_vector_len(f)
        if want is None:
            continue
        parsed = parsed.withColumn(
            "_reason",
            F.coalesce(
                F.col("_reason"),
                F.when(
                    F.col(f"_doc.{f.name}").isNotNull()
                    & (F.size(F.col(f"_doc.{f.name}")) != want),
                    F.lit(f"vector '{f.name}' length != {want}"),
                ),
            ),
        )
    # ill-typed audit: from_json runs PERMISSIVE, so a present key whose
    # value failed the schema cast (e.g. "field_int": "abc") parses to
    # NULL instead of failing the row. Key-present + parsed-NULL →
    # reject, restoring the reference's per-field strictness
    # (doc_parse.go:56-118). An explicit JSON null is indistinguishable
    # from a failed cast at this layer and rejects too — the reference
    # has no nullable-field notion either.
    for f in schema.fields:
        parsed = parsed.withColumn(
            "_reason",
            F.coalesce(
                F.col("_reason"),
                F.when(
                    F.array_contains(keys, f.name) & F.col(f"_doc.{f.name}").isNull(),
                    F.lit(f"ill-typed field: {f.name}"),
                ),
            ),
        )
    rejects = parsed.where(F.col("_reason").isNotNull()).select(
        F.col("_line").alias("line"), F.col("_reason").alias("reason")
    )
    # lines without _id get a deterministic synthesized id (md5 of the
    # raw line) — the reference auto-generates _id at parse time
    # (doc_parse.go:56-128); a content hash keeps Spark task retries
    # idempotent where a random UUID would not, and stops distinct
    # id-less lines from colliding on NULL in the upsert LWW window
    docs = parsed.where(F.col("_reason").isNull()).select(
        F.coalesce(F.col(ID_FIELD).cast("string"), F.md5(F.col("_line"))).alias(
            ID_FIELD
        ),
        *[F.col(f"_doc.{f.name}").alias(f.name) for f in schema.fields],
    )
    return docs, rejects


def load_jsonl(
    spark: SparkSession, path: str, space, strict: bool = True
) -> int:
    """Bulk-load a JSONL file into a Space. ``strict=True`` mirrors the
    router (any bad document fails the request); ``strict=False`` loads
    the valid docs and ignores rejects (backfill mode). Returns the
    number of docs upserted."""
    docs, rejects = read_jsonl(spark, path, space.schema)
    if strict:
        bad = rejects.limit(1).collect()
        if bad:
            raise DocumentError(
                f"jsonl load rejected: {bad[0]['reason']} in line {bad[0]['line']!r}"
            )
    return space.upsert(docs)
