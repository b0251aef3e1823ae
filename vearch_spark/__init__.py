"""vearch_spark — a PySpark-native vector analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
vearch/vearch (hybrid vector + scalar-filter search over schema'd document
collections) expressed idiomatically on the Spark SQL stack:

- a *Space* is a schema spec plus a parquet-backed document table
  (``vearch_spark.space.Space``);
- the typed filter algebra compiles to Catalyst ``Column`` predicates
  (``vearch_spark.filters``) so predicate pushdown / column pruning /
  partition pruning are free;
- exact top-k-by-distance is ``WHERE <filters>`` + a JVM-side distance
  expression + ``ORDER BY score LIMIT k`` — Spark's
  ``TakeOrderedAndProject`` *is* the reference's per-partition top-k +
  k-way router merge (reference: internal/router/client.go:1497-1576);
- ANN (IVF) is MLlib KMeans training + a ``cluster_id`` derived column,
  probing = a pushed-down ``cluster_id IN (...)`` filter
  (``vearch_spark.operators.ivf``);
- realtime ingest is Structured Streaming micro-batches unioned into the
  search before top-k (``vearch_spark.streaming``);
- beyond the reference surface: large-scale training-data pipeline
  operators — dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding-cosine), similarity join, text analysis, multimodal column
  plumbing (``vearch_spark.operators.dedup`` etc.).

Everything here is built only from public knowledge: the Apache Spark API
and the vearch/vearch reference's *behavior* (cited by file:line in
docstrings). No code is copied from the reference — it is a Go/C++
native engine; this is a Spark logical-plan library.
"""

from vearch_spark.registry import Registry
from vearch_spark.schema import FieldSpec, FieldType, IndexSpec, Metric, SpaceSchema
from vearch_spark.space import Space
from vearch_spark.session import get_spark

__all__ = [
    "FieldSpec",
    "FieldType",
    "IndexSpec",
    "Metric",
    "Registry",
    "SpaceSchema",
    "Space",
    "get_spark",
]

__version__ = "0.1.0"
