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
    ``ivf._query_cell_order`` (always the quantizer's L2 geometry)."""
    from vearch_spark.operators.ivf import _query_cell_order

    order = _query_cell_order(cents, np.asarray(query, dtype=np.float64))
    return [int(c) for c in order[:nprobe]]


@functools.lru_cache(maxsize=8)
def two_level_centroids(
    sf_dir: str, k1: int = 4, k2: int = 4, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """Recompute TwoLevelIVFFlatIndex's (l1, l2) centroid tree —
    mirrors ``TwoLevelIVFFlatIndex._fit_coarse`` step for step
    (level-1 Lloyd's iters=20, per-cell level-2 iters=10 with
    seed+1000+c, far-sentinel padding). Exactness vs the real fit is
    pinned by tests/test_ivf_oracle.py."""
    import pyarrow.parquet as pq

    from vearch_spark.operators.ivf import _kmeans_np

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    x = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )
    dim = x.shape[1]
    k1 = max(1, min(k1, len(x)))
    l1 = _kmeans_np(x, k1, iters=20, seed=seed)
    a1 = ((l1**2).sum(axis=1)[None, :] - 2.0 * (x @ l1.T)).argmin(axis=1)
    l2 = np.empty((k1, k2, dim), dtype=np.float64)
    valid = np.ones((k1, k2), dtype=bool)
    for c in range(k1):
        sub = x[a1 == c]
        if len(sub) == 0:
            sub = l1[c][None, :]
        cents = _kmeans_np(sub, min(k2, len(sub)), iters=10, seed=seed + 1000 + c)
        if len(cents) < k2:
            valid[c, len(cents):] = False
            pad = np.full((k2 - len(cents), dim), 1.0e6)
            pad += np.arange(len(pad))[:, None]
            cents = np.vstack([cents, pad])
        l2[c] = cents
    return l1, l2, valid


def two_level_probe_cells(
    l1: np.ndarray,
    l2: np.ndarray,
    valid: np.ndarray,
    query: list[float],
    nprobe: int,
    nprobe_l1: int,
) -> list[int]:
    """Probe order mirror of ``TwoLevelIVFFlatIndex.probe_cells``
    (L2 metric, pad cells masked by the validity mask)."""
    q = np.asarray(query, dtype=np.float64)
    k2 = l2.shape[1]
    d1 = ((l1 - q) ** 2).sum(axis=1)
    top1 = np.argsort(d1)[:nprobe_l1]
    d2 = ((l2[top1] - q) ** 2).sum(axis=2)
    d2 = np.where(valid[top1], d2, np.inf)
    order = np.argsort(d2.ravel())[:nprobe]
    w1_idx, c2 = np.divmod(order, k2)
    return [int(top1[i]) * k2 + int(j) for i, j in zip(w1_idx, c2)]


def binary_probe_cells(
    cents: np.ndarray, query_code: list[int], nprobe: int
) -> list[int]:
    """Probe order for BinaryIVF — same stable Hamming argsort as
    ``BinaryIVFIndex.probe_cells``."""
    from vearch_spark.operators.ivf import _hamming_to_centroids

    q = np.asarray(query_code, dtype=np.uint8)[None, :]
    d = _hamming_to_centroids(q, cents)[0]
    return [int(c) for c in np.argsort(d, kind="stable")[:nprobe]]
