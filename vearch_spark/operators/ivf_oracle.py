"""Deterministic centroid reproduction for the IVF oracle SQL.

The driver's correctness gate runs each ``queries()`` entry against a
DuckDB ``oracle_sql()`` twin on the same parquet tables. The IVF family
is deterministic end-to-end (fixed seed, fixed data, driver-side Lloyd's
fit in ``ivf._kmeans_np``), so the oracle can *independently recompute*
the trained quantizer here — numpy over pyarrow, no SparkSession — and
DuckDB then redoes cluster assignment + cell pruning + exact top-k in
SQL from the centroid literals. This flips the IVF rows from
``no_oracle`` (rows-only) to full hash-checked.

Parity notes:
- the Spark fit reads the embeddings via ``DataFrame.toPandas`` (one
  small parquet file, file order preserved); here pyarrow reads the same
  file in the same order, and float32→float64 widening is exact on both
  paths, so ``_kmeans_np`` sees bit-identical input and — being pure
  deterministic numpy — emits bit-identical centroids.
  ``tests/test_ivf_oracle.py`` asserts this exactness against the real
  index fit.
- probe cells are computed HERE with the same numpy routine the index
  uses (``ivf._query_cell_order`` / stable Hamming argsort), then
  embedded as literal ``cid IN (...)`` lists — the oracle's independence
  is in DuckDB recomputing the per-row assignment and the pruned exact
  top-k, not in re-deriving the tiny (k-element) probe order where a
  sort-stability mismatch would add risk without adding coverage.

Reference: the trained-index determinism mirrors the reference's dumped
index being a pure function of (data, training params) —
Engine::Dump/Load engine.cc:1246, faiss-style seeded clustering
gamma_index_ivfpq.cc / gamma_index_binary_ivf.cc:99.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=8)
def float_centroids(sf_dir: str, ncentroids: int = 16, seed: int = 42) -> np.ndarray:
    """Recompute IVFFlat/IVFPQ/IVFRaBitQ's shared coarse centroids
    (they all fit with the same seed/params on the same column, so one
    Lloyd's run serves all float-IVF oracle queries)."""
    import pyarrow.parquet as pq

    from vearch_spark.operators.ivf import _kmeans_np

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    x = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )
    k = max(1, min(ncentroids, len(x)))
    # IVFFlatIndex._fit_coarse trains on the full set below
    # coarse_train_sample (sf0.01 = 500 rows ≪ 262k), iters=20
    return _kmeans_np(x, k, iters=20, seed=seed)


@functools.lru_cache(maxsize=8)
def binary_centroids(sf_dir: str, ncentroids: int = 16, seed: int = 42) -> np.ndarray:
    """Recompute BinaryIVF's packed centroids: sign-pack the embeddings
    exactly like ``__spark_entry__._sign_codes`` (bit b of byte j =
    embedding[8j+b] > 0.5, LSB-first), then the faiss-style binary fit
    (float KMeans over unpacked bits, iters=10, per-bit majority
    re-binarization) — mirroring ``BinaryIVFIndex.fit``."""
    import pyarrow.parquet as pq

    from vearch_spark.operators.ivf import _kmeans_np

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    x = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )
    bits = (x > 0.5).astype(np.uint8)
    packed = np.packbits(bits, axis=1, bitorder="little")
    unpacked = np.unpackbits(packed, axis=1, bitorder="little").astype(np.float64)
    k = max(1, min(ncentroids, len(x)))
    float_cents = _kmeans_np(unpacked, k, iters=10, seed=seed)
    return np.packbits((float_cents > 0.5).astype(np.uint8), axis=1, bitorder="little")


def float_probe_cells(
    cents: np.ndarray, query: list[float], nprobe: int
) -> list[int]:
    """Probe order for float IVF — same numpy call as
    ``ivf._query_cell_order`` (L2 metric)."""
    from vearch_spark.operators.ivf import _query_cell_order
    from vearch_spark.schema import Metric

    order = _query_cell_order(cents, np.asarray(query, dtype=np.float64), Metric.L2)
    return [int(c) for c in order[:nprobe]]


def binary_probe_cells(
    cents: np.ndarray, query_code: list[int], nprobe: int
) -> list[int]:
    """Probe order for BinaryIVF — same stable Hamming argsort as
    ``BinaryIVFIndex.probe_cells``."""
    from vearch_spark.operators.ivf import _hamming_to_centroids

    q = np.asarray(query_code, dtype=np.uint8)[None, :]
    d = _hamming_to_centroids(q, cents)[0]
    return [int(c) for c in np.argsort(d, kind="stable")[:nprobe]]
