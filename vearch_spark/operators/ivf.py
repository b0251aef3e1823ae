"""IVF ANN indexes: MLlib-KMeans coarse quantizer + pruned exact scan.

The reference's IVFFLAT (gamma_index_ivfflat.cc) builds a KMeans coarse
quantizer, then at query time probes the ``nprobe`` nearest cells and
scans only their inverted lists. The Spark-native translation
(SURVEY.md §2.4, §4 custom op (1)):

- **train**: driver-side Lloyd's KMeans on a bounded random sample
  (the analog of faiss coarse-quantizer training at
  ``training_threshold`` docs, engine.cc:759-768 — faiss itself trains
  on ≤256k samples). Assignment of *every* row stays distributed via an
  Arrow-batched pandas UDF (one (batch,k) BLAS matmul per Arrow batch).
  MLlib KMeans was measured 5-10× slower end-to-end at small k: its
  per-iteration Spark jobs and VectorUDT conversions dominate, and a
  coarse quantizer never needs distributed training — only distributed
  assignment;
- **index** = a derived ``_cluster_id`` column on the docs table; at
  100 TB this is a written table *bucketed/partitioned by cluster id*
  so a probe prunes file-level partitions, not just rows;
- **probe**: the query's top-``nprobe`` centroids are found driver-side
  (ncentroids ≤ a few thousand floats — trivially small), and the scan
  becomes ``WHERE _cluster_id IN (<probes>)`` — a pushed-down partition
  filter — followed by the exact FLAT kernel on the survivors.

IVFPQ (gamma_index_ivfpq.cc) adds per-subvector product-quantization
codebooks with ADC scoring + a rerank pass (the published "Vearch
model", BASELINE.md). Spark-native: codebooks are trained on a bounded
driver-side sample (standard PQ practice — faiss trains on ≤256k
samples), codes are assigned once via a vectorized pandas UDF, ADC
scoring runs as an Arrow-batched pandas UDF against a per-query lookup
table, and the top ``rerank_k`` candidates are re-scored exactly from
the raw vectors (matching the reference's rerank stage).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from vearch_spark.errors import SearchError
from vearch_spark.functions.distance import score_expr
from vearch_spark.schema import ID_FIELD, Metric

CLUSTER_COL = "_cluster_id"
CODES_COL = "_pq_codes"


def _nearest_centroid_udf(centroids: np.ndarray):
    """Arrow-batched nearest-centroid assignment. The centroid matrix
    (≤ a few MB) ships in the task closure — the Spark-side analog of
    broadcasting the trained coarse quantizer to every partition."""
    from pyspark.sql.pandas.functions import pandas_udf

    c = np.ascontiguousarray(centroids, dtype=np.float64)
    c2 = (c**2).sum(axis=1)

    @pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        # argmin ‖x−c‖² = argmin (−2x·c + ‖c‖²): ‖x‖² is constant per row
        d = c2 - 2.0 * (x @ c.T)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return assign


def _query_cell_order(centroids: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Centroid ids ordered nearest-first for this query (driver-side).

    Always L2, regardless of the index's scoring metric: documents are
    assigned to cells by L2 argmin (``_nearest_centroid_udf``), so the
    cells are an L2 Voronoi partition — probing must rank cells in the
    SAME geometry or a doc's own cell may never be probed (faiss keeps
    assignment and probe on one quantizer for exactly this reason).
    The metric only decides how survivors are *scored*."""
    d = ((centroids - query) ** 2).sum(axis=1)
    return np.argsort(d)


class IVFFlatIndex:
    """IVFFLAT: coarse KMeans + cluster-pruned exact scan."""

    def __init__(
        self,
        vector_col: str,
        metric: Metric = Metric.L2,
        ncentroids: int = 256,
        nprobe: int = 16,
        id_col: str = ID_FIELD,
        seed: int = 42,
        coarse_train_sample: int = 262_144,
        **_: object,
    ):
        self.vector_col = vector_col
        self.metric = metric
        self.ncentroids = ncentroids
        self.nprobe = nprobe
        self.id_col = id_col
        self.seed = seed
        self.coarse_train_sample = coarse_train_sample
        self.centroids: np.ndarray | None = None
        self._assigned: DataFrame | None = None

    def _swap_assigned(self, new: DataFrame) -> None:
        """Persist-swap for incremental mutations. Deliberately a
        persist CHAIN, not a checkpoint: localCheckpoint would (a) be
        unrecoverable on executor/block loss where the chain recomputes
        through lineage, (b) leak the superseded copy (unpersist on a
        checkpointed DataFrame is a no-op), and (c) replace the
        InMemoryRelation whose batch min/max stats prune probe scans
        with a plain RDD scan. The plan does deepen with mutation
        count; the reference's own answer — periodic RebuildIndex —
        is the lineage reset here too (fit() re-roots the plan)."""
        old = self._assigned
        self._assigned = new.persist()
        self._assigned.count()
        if old is not None:
            old.unpersist()

    def _train_sample(self, df: DataFrame) -> np.ndarray:
        """Bounded driver-side training sample (the reference trains
        the coarse quantizer on training_threshold docs,
        engine.cc:759-768; faiss caps clustering samples the same way)
        — at 262k × 512-dim float64 that is ~1 GB driver peak, bounded
        regardless of table size."""
        n = df.count()
        vec = df.select(self.vector_col)
        if n > self.coarse_train_sample:
            vec = vec.sample(self.coarse_train_sample / n, seed=self.seed)
        sample = vec.toPandas()[self.vector_col]
        return np.stack([np.asarray(v, dtype=np.float64) for v in sample])

    def _assign_udf(self):
        """Arrow-batched cell assignment against the trained quantizer
        — the single hook fit() and add() share, so incremental adds
        can never assign differently from the build."""
        return _nearest_centroid_udf(self.centroids)

    def _fit_coarse(self, df: DataFrame) -> np.ndarray:
        """Train the coarse quantizer and set ``self._assigned`` LAZILY
        (no persist/materialize — subclasses append their encoding
        columns first so the table is only cached once). Returns the
        driver-side training sample for reuse by subclass codebooks."""
        x = self._train_sample(df)
        k = max(1, min(self.ncentroids, len(x)))
        self.centroids = _kmeans_np(x, k, iters=20, seed=self.seed)
        # assignment covers every row, distributed (Arrow-batched argmin
        # against the small broadcast centroid matrix)
        self._assigned = df.withColumn(
            CLUSTER_COL, self._assign_udf()(F.col(self.vector_col))
        )
        return x

    def _train_encoders(self, sample: np.ndarray) -> None:
        """Subclass hook: train per-row encoders (PQ codebooks, RaBitQ
        nothing-to-train) from the coarse training sample."""

    def _augment(self, assigned: DataFrame) -> DataFrame:
        """Subclass hook: append encoding columns (PQ codes, RaBitQ
        sign codes + norms) to a cluster-assigned relation. FLAT stores
        raw vectors only."""
        return assigned

    def fit(self, df: DataFrame) -> "IVFFlatIndex":
        # Re-fit is the documented RebuildIndex lineage reset: release
        # the superseded cache or CacheManager holds it forever. Must
        # happen BEFORE the new persist — a deterministic re-fit yields
        # a plan-equal cache entry that CacheManager would dedup, and
        # unpersisting the stale handle afterwards would evict the new
        # entry with it (lineage recomputes if anything still reads it).
        if self._assigned is not None:
            self._assigned.unpersist()
            self._assigned = None
        sample = self._fit_coarse(df)
        self._train_encoders(sample)
        # Cluster-clustered storage layout: range-partition + sort by
        # cluster id before caching, so probe filters prune WHOLE cache
        # batches via InMemoryTableScan's batch min/max stats — the
        # in-memory mirror of save()'s partitionBy(_cluster_id) file
        # pruning. One build-time shuffle; without it a probe still
        # scans every cached batch (measured at 1M×64: no speedup over
        # brute force; with it the pruned search tracks nprobe/ncentroids).
        self._assigned = (
            self._augment(self._assigned)
            .repartitionByRange(F.col(CLUSTER_COL))
            .sortWithinPartitions(CLUSTER_COL)
            .persist()
        )
        self._assigned.count()
        return self

    @property
    def assigned(self) -> DataFrame | None:
        """The persisted cluster-assigned relation (rows + ``_cluster_id``,
        range-partitioned and sorted by cell) — the ready-made corpus
        side for :func:`~vearch_spark.operators.knn_join.knn_join`."""
        return self._assigned

    def add(self, df: DataFrame) -> "IVFFlatIndex":
        """Incremental add: assign new rows to the EXISTING coarse cells
        and append — no retrain. This is the reference's background
        Indexing() loop adding realtime vectors to a trained index
        (Engine::AddRTVecsToIndex path, engine.cc:1084-1138); retraining
        only happens on RebuildIndex (fit). ``df`` must carry the same
        schema the index was fit on."""
        if self.centroids is None or self._assigned is None:
            raise SearchError("index not trained")
        new = self._augment(
            df.withColumn(CLUSTER_COL, self._assign_udf()(F.col(self.vector_col)))
        )
        self._swap_assigned(self._assigned.unionByName(new))
        return self

    def remove(self, ids: Sequence | DataFrame) -> "IVFFlatIndex":
        """Drop rows from the index without retrain — the Spark-native
        form of the reference's delete bitmap (every ANN candidate is
        validated against ¬deleted, SearchCondition::IsValid
        gamma_common_data.h:98-106; Engine::Delete engine.cc:869-900
        sets the bit). Here the tombstone is applied eagerly to the
        cached relation (persist swap); the saved form re-applies it as
        a row-group-pruned filter. ``ids``: a small Python sequence
        (isin — pushed predicate) or a one-column DataFrame (anti-join
        — stays distributed for bulk-write batches)."""
        if self._assigned is None:
            raise SearchError("index not trained")
        old = self._assigned
        if isinstance(ids, DataFrame):
            key = ids.select(F.col(ids.columns[0]).alias(self.id_col)).distinct()
            pruned = old.join(key, on=self.id_col, how="left_anti")
        else:
            pruned = old.where(~F.col(self.id_col).isin([i for i in ids]))
        self._swap_assigned(pruned)
        return self

    def probe_cells(self, query: Sequence[float], nprobe: int | None = None) -> list[int]:
        if self.centroids is None:
            raise SearchError("index not trained")
        nprobe = self.nprobe if nprobe is None else int(nprobe)
        if nprobe <= 0:
            raise SearchError(f"nprobe must be positive, got {nprobe}")
        order = _query_cell_order(self.centroids, np.asarray(query, dtype=np.float64))
        return [int(c) for c in order[:nprobe]]

    def search(
        self,
        df: DataFrame,  # unused: the assigned table is the index
        query: Sequence[float],
        limit: int = 50,
        flt: Column | None = None,
        nprobe: int | None = None,
        min_score: float | None = None,
        max_score: float | None = None,
        offset: int = 0,
        l2_sqrt: bool = False,
        output_fields: list[str] | None = None,
        vector_value: bool = False,
        score_col: str = "_score",
    ) -> DataFrame:
        from vearch_spark.operators import topk

        if self._assigned is None:
            raise SearchError("index not trained")
        cells = self.probe_cells(query, nprobe)
        pruned = self._assigned.where(F.col(CLUSTER_COL).isin(cells))
        if flt is not None:
            pruned = pruned.where(flt)
        out = topk.search(
            pruned.drop(CLUSTER_COL),
            vector_col=self.vector_col,
            query=list(query),
            limit=limit,
            metric=self.metric,
            min_score=min_score,
            max_score=max_score,
            offset=offset,
            l2_sqrt=l2_sqrt,
            id_col=self.id_col,
            output_fields=output_fields,
            vector_value=vector_value,
            score_col=score_col,
        )
        return out

    def search_batch(
        self,
        queries: Sequence[Sequence[float]],
        limit: int = 50,
        flt: Column | None = None,
        nprobe: int | None = None,
        l2_sqrt: bool = False,
        score_col: str = "_score",
    ) -> DataFrame:
        """Batched multi-query ANN (req_num queries per request,
        parseVectors doc_query.go:255-338, served through the index).

        The probe set is a tiny broadcast relation (query_id, cell,
        query_vec); joining it on ``_cluster_id`` pairs every document
        only with the queries probing its cell — the docs side is
        scanned once for the whole batch, scoring ``nprobe/ncentroids``
        of the (query × doc) cross product. Per-query top-k is a rank
        window on query_id (map-side limited by WindowGroupLimit).
        Returns (query_id, id, score) rows.
        """
        from pyspark.sql import Window

        from vearch_spark.operators.topk import _score_order

        if self._assigned is None:
            raise SearchError("index not trained")
        spark = self._assigned.sparkSession
        probe_rows = [
            (qid, cell, [float(x) for x in q])
            for qid, q in enumerate(queries)
            for cell in self.probe_cells(q, nprobe)
        ]
        probes = spark.createDataFrame(
            probe_rows, f"query_id int, {CLUSTER_COL} int, query_vec array<double>"
        )
        pruned = self._assigned
        if flt is not None:
            pruned = pruned.where(flt)
        joined = pruned.join(F.broadcast(probes), on=CLUSTER_COL)
        score = score_expr(
            F.col(self.vector_col), F.col("query_vec"), self.metric, l2_sqrt=l2_sqrt
        )
        scored = joined.withColumn(score_col, score)
        w = Window.partitionBy("query_id").orderBy(
            _score_order(self.metric, F.col(score_col)), F.col(self.id_col).asc()
        )
        return (
            scored.withColumn("_rank", F.row_number().over(w))
            .where(F.col("_rank") <= limit)
            .select("query_id", self.id_col, score_col)
        )

    def save(self, path: str) -> None:
        """Persist the index as its 100 TB physical form: the assigned
        table written ``partitionBy(_cluster_id)`` (so probes prune
        parquet *directories*) plus the centroid matrix. The reference
        analog is Engine::Dump (engine.cc:1246) persisting the trained
        index."""
        import json as _json
        import os

        if self._assigned is None or self.centroids is None:
            raise SearchError("index not trained")
        os.makedirs(path, exist_ok=True)
        self._assigned.write.mode("overwrite").partitionBy(CLUSTER_COL).parquet(
            os.path.join(path, "assigned")
        )
        np.save(os.path.join(path, "centroids.npy"), self.centroids)
        with open(os.path.join(path, "params.json"), "w") as fh:
            _json.dump(
                {
                    "vector_col": self.vector_col,
                    "metric": self.metric.value,
                    "ncentroids": self.ncentroids,
                    "nprobe": self.nprobe,
                    "id_col": self.id_col,
                },
                fh,
            )

    @classmethod
    def load(cls, spark, path: str) -> "IVFFlatIndex":
        """Reopen a saved index. Searches on a loaded index hit the
        partitioned parquet, so ``_cluster_id IN (probes)`` shows up as
        ``PartitionFilters`` in the scan — file-level pruning, the
        behavior that holds at 1000 executors."""
        import json as _json
        import os

        with open(os.path.join(path, "params.json")) as fh:
            params = _json.load(fh)
        idx = cls(
            vector_col=params["vector_col"],
            metric=Metric.parse(params["metric"]),
            ncentroids=params["ncentroids"],
            nprobe=params["nprobe"],
            id_col=params["id_col"],
        )
        idx.centroids = np.load(os.path.join(path, "centroids.npy"))
        idx._assigned = spark.read.parquet(os.path.join(path, "assigned"))
        return idx

    def unpersist(self) -> None:
        if self._assigned is not None:
            self._assigned.unpersist()


def _kmeans_np(x: np.ndarray, k: int, iters: int = 25, seed: int = 42) -> np.ndarray:
    """Small deterministic Lloyd's KMeans for PQ codebooks (driver-side,
    bounded sample — the same role as faiss's clustering on a training
    subset). Assignment uses the ‖x−c‖² = ‖x‖²−2x·c+‖c‖² expansion: one
    (n,k) BLAS matmul per iter instead of an (n,k,d) difference tensor."""
    rng = np.random.default_rng(seed)
    k = min(k, len(x))
    n = len(x)
    x = np.ascontiguousarray(x, dtype=np.float64)
    # greedy k-means++ seeding (scikit-learn's variant): sample
    # 2+log(k) candidates per step weighted by D², keep the one that
    # most reduces total potential. Pruned-probe recall at fixed nprobe
    # measurably beats both uniform init (0.80 mean) and plain ++
    # (worst seed 0.75) — greedy gives 0.865 mean / 0.82 worst on the
    # sf0.1 gate fixture.
    n_cand = 2 + int(np.log(k)) if k > 1 else 1
    x2 = (x**2).sum(axis=1)
    centers = np.empty((k, x.shape[1]), dtype=np.float64)
    centers[0] = x[rng.integers(n)]
    d2 = np.maximum(x2 - 2.0 * (x @ centers[0]) + (centers[0] ** 2).sum(), 0)
    for j in range(1, k):
        tot = d2.sum()
        cand = (
            rng.integers(0, n, size=n_cand)
            if tot <= 0
            else rng.choice(n, size=n_cand, p=d2 / tot)
        )
        best_d2, best_pot = None, np.inf
        for ci in cand:
            nd = np.minimum(d2, np.maximum(x2 - 2.0 * (x @ x[ci]) + x2[ci], 0))
            pot = nd.sum()
            if pot < best_pot:
                best_pot, best_d2, best_ci = pot, nd, ci
        centers[j] = x[best_ci]
        d2 = best_d2
    for _ in range(iters):
        # argmin ‖x−c‖² = argmin (‖c‖² − 2x·c): the ‖x‖² row constant is
        # dropped — one fewer (n,k) temporary per iteration
        d = (centers**2).sum(axis=1)[None, :] - 2.0 * (x @ centers.T)
        assign = d.argmin(axis=1)
        # per-cluster means via bincount (no Python loop over points)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        sums = np.zeros_like(centers)
        np.add.at(sums, assign, x)
        nonempty = counts > 0
        centers[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centers


class IVFRaBitQIndex(IVFFlatIndex):
    """IVFRABITQ (gamma_index_ivfrabitq.cc): binary quantization of the
    per-cluster *residual* plus an exact rerank pass.

    Spark-native simplification of RaBitQ: code bit j = sign of
    ``(v − centroid(v))[j]`` packed into ``dim/64`` longs, plus the
    stored residual norm ``‖v−c‖``. At query time the query's residual
    is binarized *per probed cell* (the residual depends on the cell)
    and the screen estimates the true distance angularly:

        cosθ ≈ cos(π · hamming/dim)        (sign-agreement estimator)
        est  = ‖v−c‖² + ‖q−c‖² − 2‖v−c‖‖q−c‖cosθ

    — all JVM expressions (``bit_count(xor)`` fold + ``cos``), whole-
    stage-codegen friendly. The top ``rerank_k`` by ``est`` are then
    re-scored exactly from raw vectors (the reference's rerank knob,
    SURVEY.md §2.4)."""

    CODE_COL = "_rbq_code"
    NORM_COL = "_rbq_norm"

    def __init__(self, *args, rerank_k: int | None = None, **kw):
        super().__init__(*args, **kw)
        self.rerank_k = rerank_k
        self.dim: int | None = None

    def _augment(self, assigned: DataFrame) -> DataFrame:
        if self.centroids is None:
            raise SearchError("index not trained")
        cents = self.centroids
        vcol = self.vector_col
        dim = cents.shape[1]
        self.dim = dim
        n_words = (dim + 63) // 64
        code_col, norm_col = self.CODE_COL, self.NORM_COL  # no self capture

        def encode(batches):
            for pdf in batches:
                vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vcol]])
                cells = pdf[CLUSTER_COL].to_numpy()
                resid = vecs - cents[cells]
                bits = (resid > 0).astype(np.uint8)
                pad = n_words * 64 - dim
                if pad:
                    bits = np.pad(bits, ((0, 0), (0, pad)))
                packed = np.packbits(bits, axis=1, bitorder="little").view("<i8")
                out = pdf.copy()
                out[code_col] = list(packed)
                out[norm_col] = np.linalg.norm(resid, axis=1)
                yield out

        from pyspark.sql import types as T

        schema = T.StructType(
            list(assigned.schema.fields)
            + [
                T.StructField(self.CODE_COL, T.ArrayType(T.LongType())),
                T.StructField(self.NORM_COL, T.DoubleType()),
            ]
        )
        return assigned.mapInPandas(encode, schema=schema)

    def save(self, path: str) -> None:
        import json as _json
        import os

        super().save(path)  # assigned table (incl. code+norm cols) + centroids
        with open(os.path.join(path, "rbq.json"), "w") as fh:
            _json.dump({"rerank_k": self.rerank_k}, fh)

    @classmethod
    def load(cls, spark, path: str) -> "IVFRaBitQIndex":
        import json as _json
        import os

        base = IVFFlatIndex.load(spark, path)
        with open(os.path.join(path, "rbq.json")) as fh:
            rbq = _json.load(fh)
        idx = cls(
            base.vector_col,
            base.metric,
            ncentroids=base.ncentroids,
            nprobe=base.nprobe,
            id_col=base.id_col,
            rerank_k=rbq["rerank_k"],
        )
        idx.centroids = base.centroids
        idx.dim = int(base.centroids.shape[1])
        idx._assigned = base._assigned
        return idx

    def _pack_signs(self, v: np.ndarray) -> list[int]:
        """Pack sign(v) into dim/64 little-endian longs (the same
        packing ``_augment`` applies to stored residuals)."""
        assert self.dim is not None
        n_words = (self.dim + 63) // 64
        bits = (v > 0).astype(np.uint8)
        pad = n_words * 64 - self.dim
        if pad:
            bits = np.pad(bits, (0, pad))
        return [int(w) for w in np.packbits(bits, bitorder="little").view("<i8")]

    def _query_codes(
        self, query: np.ndarray, cells: list[int]
    ) -> dict[int, tuple[list[int], float]]:
        """Per probed cell, the query-side screen constants.

        L2: (sign code of the query's residual q−c, ‖q−c‖) — the
        estimator needs the angle between the two *residuals*.
        IP: (sign code of q itself, q·c) — the screen estimates
        q·v = q·c + q·(v−c) with q·(v−c) ≈ ‖q‖·‖v−c‖·cos(π·ham/dim),
        so the reference direction is q, not a residual; the per-cell
        scalar is the exactly-known q·c term. Ordering by the L2
        estimate regardless of metric would cut large-norm, high-IP
        docs before the rerank stage (L2-closest ≠ IP-best on
        un-normalized vectors)."""
        assert self.centroids is not None and self.dim is not None
        out = {}
        for c in cells:
            if self.metric is Metric.L2:
                resid = query - self.centroids[c]
                out[c] = (self._pack_signs(resid), float(np.linalg.norm(resid)))
            else:
                out[c] = (
                    self._pack_signs(query),
                    float(self.centroids[c] @ query),
                )
        return out

    def search(
        self,
        df: DataFrame,
        query: Sequence[float],
        limit: int = 50,
        flt: Column | None = None,
        nprobe: int | None = None,
        min_score: float | None = None,
        max_score: float | None = None,
        offset: int = 0,
        l2_sqrt: bool = False,
        output_fields: list[str] | None = None,
        vector_value: bool = False,
        score_col: str = "_score",
    ) -> DataFrame:
        from vearch_spark.operators import topk

        if self._assigned is None:
            raise SearchError("index not trained")
        q = np.asarray(query, dtype=np.float64)
        cells = self.probe_cells(query, nprobe)
        qcodes = self._query_codes(q, cells)
        spark = self._assigned.sparkSession
        probes = spark.createDataFrame(
            [(c, qcodes[c][0], qcodes[c][1]) for c in cells],
            f"{CLUSTER_COL} int, _qcode array<long>, _qaux double",
        )
        pruned = self._assigned.where(F.col(CLUSTER_COL).isin(cells))
        if flt is not None:
            pruned = pruned.where(flt)
        joined = pruned.join(F.broadcast(probes), on=CLUSTER_COL)
        # Hamming: Σ bit_count(code[i] XOR qcode[i]), pure JVM; then the
        # angular estimate (docstring formula / _query_codes docstring)
        ham = F.aggregate(
            F.zip_with(
                F.col(self.CODE_COL),
                F.col("_qcode"),
                lambda a, b: F.bit_count(a.bitwiseXOR(b)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        import math

        cos_est = F.cos(ham * F.lit(math.pi / float(self.dim)))
        vn = F.col(self.NORM_COL)
        if self.metric is Metric.L2:
            qn = F.col("_qaux")  # ‖q−c‖
            est = vn * vn + qn * qn - F.lit(2.0) * vn * qn * cos_est
        else:
            # est q·v = q·c + ‖q‖·‖v−c‖·cos(angle(q, v−c))
            est = F.col("_qaux") + F.lit(float(np.linalg.norm(q))) * vn * cos_est
        # candidates must cover the page the caller will slice
        # (topk.search applies .offset(offset).limit(limit) downstream)
        rerank_k = max(self.rerank_k or max(limit * 4, 64), offset + limit)
        est_order = F.col("_est").asc() if self.metric.ascending else F.col("_est").desc()
        cands = (
            joined.withColumn("_est", est)
            .orderBy(est_order, F.col(self.id_col).asc())
            .limit(rerank_k)
        )
        return topk.search(
            cands.drop(CLUSTER_COL, self.CODE_COL, self.NORM_COL, "_qcode", "_qaux", "_est"),
            vector_col=self.vector_col,
            query=list(query),
            limit=limit,
            metric=self.metric,
            min_score=min_score,
            max_score=max_score,
            offset=offset,
            l2_sqrt=l2_sqrt,
            id_col=self.id_col,
            output_fields=output_fields,
            vector_value=vector_value,
            score_col=score_col,
        )


class IVFPQIndex(IVFFlatIndex):
    """IVFPQ with ADC scoring + exact rerank (the published Vearch
    config: ncentroids, nprobe, nsubvector — space.go:76-85).

    ``by_residual`` (default True, matching faiss IndexIVFPQ which the
    gamma engine wraps — gamma_index_ivfpq.cc): PQ codes quantize the
    RESIDUAL x − centroid(cell), and the ADC table is built per probed
    cell from the query's residual against that cell. Raw-vector PQ
    (by_residual=False) looks fine on low-dim data but collapses on
    high-dim clustered corpora: the cluster offset dominates every
    code, same-cell candidates become ADC-indistinguishable, and the
    rerank pool degrades to a random sample of the cell — measured at
    the reference's published VGG1M config (1M×512, ncentroids=1024,
    nprobe=40, nsubvector=64): recall@10 0.44 raw vs the residual
    form's (see SCALE.md)."""

    def __init__(
        self,
        vector_col: str,
        metric: Metric = Metric.L2,
        ncentroids: int = 256,
        nprobe: int = 16,
        nsubvector: int = 8,
        nbits: int = 8,
        rerank_k: int | None = None,
        # faiss-style bound: PQ codebooks converge on ~256 pts/centroid;
        # more sample only slows the driver-side fit
        train_sample: int = 65_536,
        id_col: str = ID_FIELD,
        seed: int = 42,
        by_residual: bool = True,
        **_: object,
    ):
        super().__init__(vector_col, metric, ncentroids, nprobe, id_col=id_col, seed=seed)
        self.nsubvector = nsubvector
        self.ksub = 2**nbits
        self.rerank_k = rerank_k
        self.train_sample = train_sample
        self.by_residual = by_residual
        self.codebooks: np.ndarray | None = None  # (nsub, ksub, dsub)

    def _residualize(self, x: np.ndarray) -> np.ndarray:
        """x − nearest-centroid(x), chunked so the distance matrix
        never exceeds ~64 MB driver-side."""
        out = np.empty_like(x)
        c2 = (self.centroids**2).sum(axis=1)[None, :]
        step = max(1, (1 << 23) // max(1, len(self.centroids)))
        for lo in range(0, len(x), step):
            blk = x[lo : lo + step]
            d = (blk**2).sum(axis=1)[:, None] - 2.0 * (blk @ self.centroids.T) + c2
            out[lo : lo + step] = blk - self.centroids[d.argmin(axis=1)]
        return out

    def _train_encoders(self, sample: np.ndarray) -> None:
        # reuse the coarse training sample for the PQ codebooks (same
        # distribution, skips a second driver-side collect job); with
        # by_residual the codebooks quantize residual space, like
        # faiss's IndexIVFPQ train_residual
        x = sample[: self.train_sample]
        if self.by_residual:
            x = self._residualize(x)
        dim = x.shape[1]
        if dim % self.nsubvector:
            raise SearchError(
                f"dimension {dim} not divisible by nsubvector {self.nsubvector}"
            )
        dsub = dim // self.nsubvector
        self.codebooks = np.stack(
            [
                _kmeans_np(x[:, i * dsub : (i + 1) * dsub], self.ksub, seed=self.seed + i)
                for i in range(self.nsubvector)
            ]
        )

    def _query_lut(self, query: Sequence[float]) -> np.ndarray:
        """Per-query (nsub, ksub) ADC partial-score table against the
        RAW query (no residual) — float64 exact; the FastScan subclass
        quantizes it. Kept as the shared building block: with
        by_residual the per-cell tables in :meth:`_pq_cell_luts` are
        this same computation over each probed cell's query residual."""
        q = np.asarray(query, dtype=np.float64)
        nsub, _, dsub = self.codebooks.shape
        if self.metric is Metric.L2:
            return np.stack(
                [
                    ((self.codebooks[i] - q[i * dsub : (i + 1) * dsub]) ** 2).sum(axis=1)
                    for i in range(nsub)
                ]
            )
        return np.stack(
            [self.codebooks[i] @ q[i * dsub : (i + 1) * dsub] for i in range(nsub)]
        )

    def _pq_cell_luts(
        self, query: Sequence[float], cells: list[int]
    ) -> tuple[np.ndarray, np.ndarray, float]:
        """ADC tables for the probed cells: (luts (m, nsub·ksub),
        add_back (m,), scale) with
        score ≈ lut_gather_sum · scale + add_back[cell].

        by_residual + L2: per-cell table over the query residual
        q − centroid(cell) (faiss IndexIVFPQ by_residual). by_residual
        + IP: q·x = q·c + q·residual, so ONE shared table over q (the
        returned luts has a single row — callers map every cell to row
        0; no m-fold copy ships in the task closure) plus a per-cell
        q·c add-back. Raw PQ: the single cell-independent table. The
        float base form returns scale=1.0; FastScan overrides with the
        int8-quantized form. The base tables are computed NON-
        polymorphically (IVFPQIndex._query_lut, not self._query_lut):
        a subclass's quantized table must never be mixed with the
        float add-back — quantize-once happens in the override."""
        q = np.asarray(query, dtype=np.float64)
        nsub, ksub, dsub = self.codebooks.shape
        m = len(cells)
        add_back = np.zeros(m, dtype=np.float64)
        if self.by_residual and self.metric is Metric.L2:
            luts = np.empty((m, nsub, ksub), dtype=np.float64)
            for ci, cell in enumerate(cells):
                qr = q - self.centroids[cell]
                for i in range(nsub):
                    blk = qr[i * dsub : (i + 1) * dsub]
                    luts[ci, i] = ((self.codebooks[i] - blk) ** 2).sum(axis=1)
        else:
            luts = IVFPQIndex._query_lut(self, query)[None, :, :]  # (1, nsub, ksub)
            if self.by_residual:  # IP: fold q·centroid back per cell
                for ci, cell in enumerate(cells):
                    add_back[ci] = float(q @ self.centroids[cell])
        return luts.reshape(luts.shape[0], nsub * ksub), add_back, 1.0

    def _augment(self, assigned: DataFrame) -> DataFrame:
        # assign PQ codes, Arrow-batched (closure must not capture
        # self — it holds unpicklable DataFrames)
        if self.codebooks is None:
            raise SearchError("index not trained")
        cb = self.codebooks
        nsub, _, dsub_ = cb.shape
        vcol = self.vector_col
        cents = self.centroids if self.by_residual else None

        def encode(batches):
            for pdf in batches:
                vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vcol]])
                if cents is not None and len(vecs):
                    # residual PQ: codes quantize x − centroid(cell);
                    # the row's cell id is already assigned upstream
                    vecs = vecs - cents[pdf[CLUSTER_COL].to_numpy()]
                codes = np.empty((len(vecs), nsub), dtype=np.int32)
                for i in range(nsub):
                    sub = vecs[:, i * dsub_ : (i + 1) * dsub_]
                    d = (
                        (sub**2).sum(axis=1)[:, None]
                        - 2.0 * (sub @ cb[i].T)
                        + (cb[i] ** 2).sum(axis=1)[None, :]
                    )
                    codes[:, i] = d.argmin(axis=1)
                out = pdf.copy()
                out[CODES_COL] = list(codes)
                yield out

        from pyspark.sql import types as T

        # (don't use StructType.add — it mutates the cached df schema)
        schema = T.StructType(
            list(assigned.schema.fields)
            + [T.StructField(CODES_COL, T.ArrayType(T.IntegerType()))]
        )
        return assigned.mapInPandas(encode, schema=schema)

    def save(self, path: str) -> None:
        import json as _json
        import os

        if self.codebooks is None:
            raise SearchError("index not trained")
        super().save(path)
        np.save(os.path.join(path, "codebooks.npy"), self.codebooks)
        with open(os.path.join(path, "pq.json"), "w") as fh:
            _json.dump({"nsubvector": self.nsubvector, "ksub": self.ksub,
                        "rerank_k": self.rerank_k,
                        "by_residual": self.by_residual}, fh)

    @classmethod
    def load(cls, spark, path: str) -> "IVFPQIndex":
        import json as _json
        import os

        base = IVFFlatIndex.load(spark, path)
        with open(os.path.join(path, "pq.json")) as fh:
            pq = _json.load(fh)
        idx = cls(
            vector_col=base.vector_col,
            metric=base.metric,
            ncentroids=base.ncentroids,
            nprobe=base.nprobe,
            nsubvector=pq["nsubvector"],
            rerank_k=pq["rerank_k"],
            id_col=base.id_col,
            # saves from before the residual default carried raw codes
            by_residual=pq.get("by_residual", False),
        )
        idx.ksub = pq["ksub"]
        idx.centroids = base.centroids
        idx._assigned = base._assigned
        idx.codebooks = np.load(os.path.join(path, "codebooks.npy"))
        return idx

    def search(
        self,
        df: DataFrame,
        query: Sequence[float],
        limit: int = 50,
        flt: Column | None = None,
        nprobe: int | None = None,
        min_score: float | None = None,
        max_score: float | None = None,
        offset: int = 0,
        l2_sqrt: bool = False,
        output_fields: list[str] | None = None,
        vector_value: bool = False,
        score_col: str = "_score",
    ) -> DataFrame:
        from vearch_spark.operators import topk

        if self._assigned is None or self.codebooks is None:
            raise SearchError("index not trained")
        cells = self.probe_cells(query, nprobe)
        pruned = self._assigned.where(F.col(CLUSTER_COL).isin(cells))
        if flt is not None:
            pruned = pruned.where(flt)

        # per-probed-cell ADC tables (residual-aware; the FastScan
        # subclass overrides _pq_cell_luts with the int8-quantized
        # form — same gather+sum kernel either way)
        luts, add_back, scale = self._pq_cell_luts(query, list(cells))
        cell_idx = {int(c): j for j, c in enumerate(cells)}
        shared_lut = luts.shape[0] == 1  # one table for all cells (IP/raw)
        nsub, ksub, _ = self.codebooks.shape
        offsets = (np.arange(nsub) * ksub).astype(np.int64)

        from pyspark.sql.pandas.functions import pandas_udf

        @pandas_udf("double")
        def adc(cl: pd.Series, codes: pd.Series) -> pd.Series:
            if len(codes) == 0:
                return pd.Series([], dtype="float64")
            mat = np.stack(codes.to_numpy())
            cj = np.fromiter(
                (cell_idx[int(c)] for c in cl.to_numpy()), dtype=np.int64,
                count=len(mat),
            )
            out = np.empty(len(mat), dtype=np.float64)
            for j in np.unique(np.zeros_like(cj) if shared_lut else cj):
                msk = slice(None) if shared_lut else cj == j
                out[msk] = luts[j][mat[msk] + offsets].sum(axis=1)
            return pd.Series(out * scale + add_back[cj])

        approx = pruned.withColumn("_adc", adc(F.col(CLUSTER_COL), F.col(CODES_COL)))
        # candidates must cover the page the caller will slice
        # (topk.search applies .offset(offset).limit(limit) downstream)
        rerank_k = max(self.rerank_k or max(limit * 4, 64), offset + limit)
        adc_order = F.col("_adc").asc() if self.metric.ascending else F.col("_adc").desc()
        cands = approx.orderBy(adc_order, F.col(self.id_col).asc()).limit(rerank_k)

        # exact rerank on raw vectors (the reference's rerank stage)
        return topk.search(
            cands.drop(CLUSTER_COL, CODES_COL, "_adc"),
            vector_col=self.vector_col,
            query=list(query),
            limit=limit,
            metric=self.metric,
            min_score=min_score,
            max_score=max_score,
            offset=offset,
            l2_sqrt=l2_sqrt,
            id_col=self.id_col,
            output_fields=output_fields,
            vector_value=vector_value,
            score_col=score_col,
        )


class IVFPQFastScanIndex(IVFPQIndex):
    """IVFPQFastScan as a DISTINCT physical path
    (gamma_index_ivfpqfs.cc:36 → faiss IndexIVFPQFastScan). FastScan's
    two defining properties, both kept:

    - **4-bit PQ codes** (``nbits=4`` default — ksub=16, half the code
      bytes of classic PQ8);
    - **integer-quantized lookup tables**: the per-query ADC table is
      affine-quantized to uint8 (per-subquantizer bias, one shared
      scale — faiss's quantize_LUT shape), so the candidate screen
      gathers small ints and accumulates exactly in int32 instead of
      gathering float64. faiss then feeds those int8 LUTs to an AVX2
      shuffle; numpy's take+sum over a 16-entry int table is the
      vectorized analog available here — same memory-traffic win
      (16×int8 LUT per subquantizer fits a SIMD register / L1 line),
      no platform intrinsics.

    The quantization only coarsens the SCREEN ordering; the exact
    rerank stage (shared with IVFPQ) re-scores raw vectors, so the
    final contract is unchanged — recall is gated in
    tests/test_ivf_recall.py and the screen's agreement with the
    float-LUT screen is asserted directly."""

    def __init__(self, *args, nbits: int = 4, **kw):
        kw["nbits"] = nbits
        super().__init__(*args, **kw)

    def _query_lut(self, query: Sequence[float]) -> np.ndarray:
        lut = super()._query_lut(query)
        # faiss quantize_LUT: per-row (subquantizer) bias, one global
        # scale — preserves the ORDER of total scores better than
        # per-row scales (sums of per-row-rescaled terms aren't
        # comparable across rows)
        bias = lut.min(axis=1, keepdims=True)
        spread = float((lut - bias).max())
        if spread == 0.0:
            return np.zeros_like(lut, dtype=np.int32)
        q = np.round((lut - bias) * (255.0 / spread))
        return q.astype(np.int32)

    def _pq_cell_luts(
        self, query: Sequence[float], cells: list[int]
    ) -> tuple[np.ndarray, np.ndarray, float]:
        # quantize the FLOAT residual-aware tables from the base class
        # (which computes them non-polymorphically, so this is the one
        # and only quantization) — shared helper with ScannIndex
        luts, add_back, _ = super()._pq_cell_luts(query, cells)
        return _quantize_cell_luts(
            luts.reshape(luts.shape[0], self.nsubvector, self.ksub), add_back
        )


def _quantize_cell_luts(
    luts3: np.ndarray, add_back: np.ndarray
) -> tuple[np.ndarray, np.ndarray, float]:
    """INT8_LUT16-style screen quantization shared by IVFPQFastScan and
    SCANN: per-(cell, subquantizer) bias + ONE global scale, bias sums
    folded into the per-cell add-back so integer screen scores stay
    comparable ACROSS cells. (luts3: (m, nsub, ksub) float tables;
    add_back may have more entries than m when the float tables are a
    single shared row — the bias fold broadcasts.) Returns
    (int32 (m, nsub·ksub), add_back', scale)."""
    m = luts3.shape[0]
    bias = luts3.min(axis=2, keepdims=True)
    spread = float((luts3 - bias).max())
    back = add_back + bias.sum(axis=1).ravel()
    if spread == 0.0:
        return np.zeros_like(luts3, dtype=np.int32).reshape(m, -1), back, 1.0
    scale = spread / 255.0
    iq = np.round((luts3 - bias) / scale).astype(np.int32)
    return iq.reshape(m, -1), back, scale


class ScannIndex(IVFPQIndex):
    """SCANN — IVF + residual PQ with ANISOTROPIC (noise-shaped) code
    assignment + exact reordering.

    The reference ships Google ScaNN behind a C wrapper
    (`internal/engine/index/impl/scann/gamma_index_vearch.cc`,
    `scann_api.h`) configured by `scann/config.txt`: IVF partitioning
    (`num_children`, `max_spill_centers` = nprobe), asymmetric hashing
    with `use_residual_quantization: True`, 4-bit codes
    (`num_clusters_per_block: 16`, INT8_LUT16), a
    `noise_shaping_threshold` of 0.2, and `exact_reordering`. This
    class re-expresses each of those pieces on the Spark skeleton the
    sibling IVF indexes share; the algorithmic content follows the
    published method (Guo et al., *Accelerating Large-Scale Inference
    with Anisotropic Vector Quantization*, ICML 2020):

    - **residual quantization**: PQ codebooks are trained on and codes
      encode r = x − centroid(cell), so the per-query lookup table is
      per-PROBED-CELL (built on q − centroid for L2, on q with the
      centroid dot added back for IP);
    - **anisotropic assignment**: codes are chosen by coordinate
      descent over subspaces minimizing
      ``‖e‖² + (η−1)·(e·x̂)²`` where e is the quantization error,
      x̂ = x/‖x‖, and η = h∥/h⊥ = (d−1)·t̃²/(1−t̃²) with
      t̃ = T/‖x‖ (the paper's Theorem 3.2 weighting for score
      threshold T) — error PARALLEL to the datapoint costs more
      because it directly perturbs the inner product of high-scoring
      pairs;
    - **INT8_LUT16 screen**: per-(cell, subquantizer) bias + one
      global scale quantize the LUTs to uint8; the integer partial-sum
      screen stays comparable ACROSS cells by adding each cell's bias
      sum back at the end;
    - **exact reordering**: the top ``rerank_k`` by screen score are
      re-scored exactly from raw vectors (shared `topk.search` stage).

    ``noise_shaping_threshold=None`` degrades to plain residual PQ —
    the control arm the anisotropic recall test compares against.
    """

    def __init__(
        self,
        vector_col: str,
        metric: Metric = Metric.L2,
        ncentroids: int = 256,
        nprobe: int = 16,
        nsubvector: int = 8,
        nbits: int = 4,
        noise_shaping_threshold: float | str | None = "auto",
        rerank_k: int | None = None,
        train_sample: int = 65_536,
        id_col: str = ID_FIELD,
        seed: int = 42,
        **kw: object,
    ):
        super().__init__(
            vector_col, metric, ncentroids, nprobe,
            nsubvector=nsubvector, nbits=nbits, rerank_k=rerank_k,
            train_sample=train_sample, id_col=id_col, seed=seed, **kw,
        )
        # "auto" resolves at fit time to 0.2 x the median training
        # norm — the reference config's 0.2 default generalized off
        # unit-norm embeddings (an ABSOLUTE 0.2 on data with norm ~20
        # puts every point far outside the threshold sphere; see the
        # eta floor in _anisotropic_codes)
        if noise_shaping_threshold is None or noise_shaping_threshold == "auto":
            self.noise_shaping_threshold = noise_shaping_threshold
        else:
            self.noise_shaping_threshold = float(noise_shaping_threshold)

    # ------------------------------------------------------------ training

    def _train_encoders(self, sample: np.ndarray) -> None:
        # codebooks on RESIDUALS (use_residual_quantization: True):
        # assign the coarse-training sample to its cells first
        x = sample[: self.train_sample]
        dim = x.shape[1]
        if dim % self.nsubvector:
            raise SearchError(
                f"dimension {dim} not divisible by nsubvector {self.nsubvector}"
            )
        if self.noise_shaping_threshold == "auto":
            self.noise_shaping_threshold = float(
                0.2 * np.median(np.sqrt((x**2).sum(axis=1)))
            )
        a = (
            (self.centroids**2).sum(axis=1)[None, :] - 2.0 * (x @ self.centroids.T)
        ).argmin(axis=1)
        r = x - self.centroids[a]
        dsub = dim // self.nsubvector
        self.codebooks = np.stack(
            [
                _kmeans_np(r[:, i * dsub : (i + 1) * dsub], self.ksub, seed=self.seed + i)
                for i in range(self.nsubvector)
            ]
        )

    # ----------------------------------------------------------- assignment

    @staticmethod
    def _anisotropic_codes(
        vecs: np.ndarray,
        resid: np.ndarray,
        cb: np.ndarray,
        threshold: float | None,
        n_passes: int = 2,
    ) -> np.ndarray:
        """Code assignment. Plain per-subspace argmin when
        ``threshold`` is None; otherwise coordinate descent on the
        anisotropic loss — each sweep re-picks every block's code with
        the other blocks fixed, so the loss is monotonically
        non-increasing (pinned by test_scann.py)."""
        n, dim = resid.shape
        nsub, ksub, dsub = cb.shape
        codes = np.empty((n, nsub), dtype=np.int32)
        for i in range(nsub):
            sub = resid[:, i * dsub : (i + 1) * dsub]
            d = (
                (sub**2).sum(axis=1)[:, None]
                - 2.0 * (sub @ cb[i].T)
                + (cb[i] ** 2).sum(axis=1)[None, :]
            )
            codes[:, i] = d.argmin(axis=1)
        if threshold is None or n == 0:
            return codes

        norms2 = (vecs**2).sum(axis=1)
        safe = np.maximum(norms2, 1e-12)
        # t̃² = T²/‖x‖², capped below 1 (a point inside the score
        # threshold sphere would want infinite parallel weight)
        t2 = np.clip((threshold**2) / safe, 0.0, 0.99)
        # floored at 1: the derivation yields eta < 1 for points whose
        # norm dwarfs the threshold, which REWARDS parallel error — on
        # recall@k it is strictly worse than isotropic (measured 0.46
        # vs 0.68 screen recall on the test fixture at T = 0.1·‖x‖).
        # The floor makes mis-scaled thresholds degrade to plain
        # residual PQ instead of inverting the objective.
        eta = np.maximum((dim - 1) * t2 / (1.0 - t2), 1.0)  # h∥/h⊥ per point
        xhat = vecs / np.sqrt(safe)[:, None]

        # e = r − decode(codes); maintain ‖e‖² and p = e·x̂ incrementally
        e = resid - np.concatenate(
            [cb[i][codes[:, i]] for i in range(nsub)], axis=1
        )
        e_sq = (e**2).sum(axis=1)
        p = (e * xhat).sum(axis=1)
        for _ in range(n_passes):
            for i in range(nsub):
                sl = slice(i * dsub, (i + 1) * dsub)
                r_b, x_b, e_b = resid[:, sl], xhat[:, sl], e[:, sl]
                base_sq = e_sq - (e_b**2).sum(axis=1)
                base_p = p - (e_b * x_b).sum(axis=1)
                # candidate error blocks e'_b = r_b − cb[i,k]
                cand_sq = (
                    (r_b**2).sum(axis=1)[:, None]
                    - 2.0 * (r_b @ cb[i].T)
                    + (cb[i] ** 2).sum(axis=1)[None, :]
                )
                cand_p = (r_b * x_b).sum(axis=1)[:, None] - (x_b @ cb[i].T)
                tot_p = base_p[:, None] + cand_p
                loss = base_sq[:, None] + cand_sq + (eta - 1.0)[:, None] * tot_p**2
                k = loss.argmin(axis=1)
                rows = np.arange(n)
                codes[:, i] = k
                new_e_b = r_b - cb[i][k]
                e[:, sl] = new_e_b
                e_sq = base_sq + cand_sq[rows, k]
                p = tot_p[rows, k]
        return codes

    def _augment(self, assigned: DataFrame) -> DataFrame:
        if self.codebooks is None or self.centroids is None:
            raise SearchError("index not trained")
        cb, cents = self.codebooks, self.centroids
        thr = self.noise_shaping_threshold
        vcol = self.vector_col
        aniso = ScannIndex._anisotropic_codes

        def encode(batches):
            for pdf in batches:
                vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vcol]])
                out = pdf.copy()
                if len(vecs) == 0:
                    out[CODES_COL] = []
                    yield out
                    continue
                resid = vecs - cents[pdf[CLUSTER_COL].to_numpy()]
                codes = aniso(vecs, resid, cb, thr)
                out[CODES_COL] = list(codes)
                yield out

        from pyspark.sql import types as T

        schema = T.StructType(
            list(assigned.schema.fields)
            + [T.StructField(CODES_COL, T.ArrayType(T.IntegerType()))]
        )
        return assigned.mapInPandas(encode, schema=schema)

    # --------------------------------------------------------------- search

    def _cell_luts(self, query: Sequence[float], cells: list[int]):
        """Per-probed-cell residual LUTs quantized INT8_LUT16-style:
        returns (int32 luts (m, nsub·ksub), float add-back per cell,
        float scale) such that
        score ≈ int_sum · scale + add_back[cell] — exact ordering
        within the quantization granularity, comparable across cells."""
        q = np.asarray(query, dtype=np.float64)
        nsub, ksub, dsub = self.codebooks.shape
        m = len(cells)
        luts = np.empty((m, nsub, ksub), dtype=np.float64)
        const = np.zeros(m, dtype=np.float64)
        for ci, cell in enumerate(cells):
            c = self.centroids[cell]
            if self.metric is Metric.L2:
                qr = q - c
                for i in range(nsub):
                    blk = qr[i * dsub : (i + 1) * dsub]
                    luts[ci, i] = ((self.codebooks[i] - blk) ** 2).sum(axis=1)
            else:
                const[ci] = float(q @ c)
                for i in range(nsub):
                    blk = q[i * dsub : (i + 1) * dsub]
                    luts[ci, i] = self.codebooks[i] @ blk
        return _quantize_cell_luts(luts, const)

    def search(
        self,
        df: DataFrame,
        query: Sequence[float],
        limit: int = 50,
        flt: Column | None = None,
        nprobe: int | None = None,
        min_score: float | None = None,
        max_score: float | None = None,
        offset: int = 0,
        l2_sqrt: bool = False,
        output_fields: list[str] | None = None,
        vector_value: bool = False,
        score_col: str = "_score",
    ) -> DataFrame:
        from vearch_spark.operators import topk

        if self._assigned is None or self.codebooks is None:
            raise SearchError("index not trained")
        cells = self.probe_cells(query, nprobe)
        pruned = self._assigned.where(F.col(CLUSTER_COL).isin(cells))
        if flt is not None:
            pruned = pruned.where(flt)

        flat_luts, add_back, scale = self._cell_luts(query, cells)
        nsub, ksub, _ = self.codebooks.shape
        offsets = (np.arange(nsub) * ksub).astype(np.int64)
        cells_arr = np.asarray(cells, dtype=np.int64)
        order = np.argsort(cells_arr)
        sorted_cells = cells_arr[order]

        from pyspark.sql.pandas.functions import pandas_udf

        @pandas_udf("double")
        def adc(cluster: pd.Series, codes: pd.Series) -> pd.Series:
            if len(codes) == 0:
                return pd.Series([], dtype="float64")
            idx = order[np.searchsorted(sorted_cells, cluster.to_numpy())]
            mat = np.stack(codes.to_numpy())
            ints = flat_luts[idx[:, None], mat + offsets].sum(axis=1)
            return pd.Series(ints * scale + add_back[idx])

        approx = pruned.withColumn("_adc", adc(F.col(CLUSTER_COL), F.col(CODES_COL)))
        rerank_k = max(self.rerank_k or max(limit * 4, 64), offset + limit)
        adc_order = F.col("_adc").asc() if self.metric.ascending else F.col("_adc").desc()
        cands = approx.orderBy(adc_order, F.col(self.id_col).asc()).limit(rerank_k)
        # exact reordering (config.txt exact_reordering)
        return topk.search(
            cands.drop(CLUSTER_COL, CODES_COL, "_adc"),
            vector_col=self.vector_col,
            query=list(query),
            limit=limit,
            metric=self.metric,
            min_score=min_score,
            max_score=max_score,
            offset=offset,
            l2_sqrt=l2_sqrt,
            id_col=self.id_col,
            output_fields=output_fields,
            vector_value=vector_value,
            score_col=score_col,
        )

    # -------------------------------------------------------------- persist

    def save(self, path: str) -> None:
        import json as _json
        import os

        super().save(path)
        with open(os.path.join(path, "scann.json"), "w") as fh:
            _json.dump(
                {"noise_shaping_threshold": self.noise_shaping_threshold}, fh
            )

    @classmethod
    def load(cls, spark, path: str) -> "ScannIndex":
        import json as _json
        import os

        idx = super().load(spark, path)
        with open(os.path.join(path, "scann.json")) as fh:
            idx.noise_shaping_threshold = _json.load(fh)[
                "noise_shaping_threshold"
            ]
        return idx


# --- BINARYIVF -------------------------------------------------------------

# 8-bit popcount lookup table for vectorized Hamming distance
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)


def _hamming_to_centroids(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, nbytes) uint8 codes vs (k, nbytes) uint8 centroids →
    (n, k) Hamming distances via the popcount LUT."""
    return _POP8[x[:, None, :] ^ cents[None, :, :]].sum(axis=2)


def _nearest_binary_centroid_udf(centroids: np.ndarray):
    """Arrow-batched Hamming argmin against the packed binary centroid
    matrix (k × d/8 bytes — tiny, ships in the task closure)."""
    from pyspark.sql.pandas.functions import pandas_udf

    c = np.ascontiguousarray(centroids, dtype=np.uint8)

    @pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        x = np.stack([np.asarray(v, dtype=np.uint8) for v in vs])
        d = _hamming_to_centroids(x, c)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return assign


class BinaryIVFIndex:
    """BINARYIVF (gamma_index_binary_ivf.cc): Hamming-metric IVF over
    packed uint8 codes — faiss IndexBinaryIVF semantics.

    Training mirrors faiss: unpack the code bits to floats, run
    standard KMeans (the reference sets cp.niter=10,
    gamma_index_binary_ivf.cc:99), then re-binarize the centroids
    (bit j = mean > 0.5, i.e. per-bit majority vote). Assignment and
    probing are Hamming argmin against the packed centroids. Defaults
    mirror the reference: ncentroids=256 (BinaryModelParams,
    gamma_index_binary_ivf.cc:23), nprobe=20
    (gamma_index_binary_ivf.cc:117).

    The index is the same physical shape as IVFFLAT — a derived
    ``_cluster_id`` column, written ``partitionBy(_cluster_id)`` at
    scale so probes prune files — but the scan kernel is
    ``bit_count(xor)`` over d/8 bytes (JVM whole-stage codegen),
    ~32× fewer scan bytes than float vectors of the same dim.
    """

    def __init__(
        self,
        code_col: str,
        ncentroids: int = 256,
        nprobe: int = 20,
        id_col: str = ID_FIELD,
        seed: int = 42,
        coarse_train_sample: int = 262_144,
        **_: object,
    ):
        self.code_col = code_col
        self.ncentroids = ncentroids
        self.nprobe = nprobe
        self.id_col = id_col
        self.seed = seed
        self.coarse_train_sample = coarse_train_sample
        self.centroids: np.ndarray | None = None  # (k, nbytes) uint8, packed
        self._assigned: DataFrame | None = None

    # shared persist-swap (touches only _assigned, which both index
    # families define identically)
    _swap_assigned = IVFFlatIndex._swap_assigned

    def fit(self, df: DataFrame) -> "BinaryIVFIndex":
        # re-fit releases the superseded cache BEFORE the new persist
        # (plan-equal entries dedup — see IVFFlatIndex.fit)
        if self._assigned is not None:
            self._assigned.unpersist()
            self._assigned = None
        n = df.count()
        k = max(1, min(self.ncentroids, n))
        codes = df.select(self.code_col)
        if n > self.coarse_train_sample:
            codes = codes.sample(self.coarse_train_sample / n, seed=self.seed)
        sample = codes.toPandas()[self.code_col]
        packed = np.stack([np.asarray(v, dtype=np.uint8) for v in sample])
        # faiss-style binary clustering: float KMeans over unpacked bits,
        # centroids re-binarized by per-bit majority (mean > 0.5)
        bits = np.unpackbits(packed, axis=1, bitorder="little").astype(np.float64)
        float_cents = _kmeans_np(bits, k, iters=10, seed=self.seed)
        self.centroids = np.packbits(
            (float_cents > 0.5).astype(np.uint8), axis=1, bitorder="little"
        )
        self._assigned = (
            df.withColumn(
                CLUSTER_COL,
                _nearest_binary_centroid_udf(self.centroids)(F.col(self.code_col)),
            )
            # cluster-clustered cache layout — see IVFFlatIndex.fit
            .repartitionByRange(F.col(CLUSTER_COL))
            .sortWithinPartitions(CLUSTER_COL)
            .persist()
        )
        self._assigned.count()
        return self

    def add(self, df: DataFrame) -> "BinaryIVFIndex":
        """Incremental add to the trained index (the reference's
        realtime RTInvertIndex AddDocs path): Hamming-assign new codes
        to the existing centroids and append — no retrain."""
        if self.centroids is None or self._assigned is None:
            raise SearchError("index not trained")
        new = df.withColumn(
            CLUSTER_COL,
            _nearest_binary_centroid_udf(self.centroids)(F.col(self.code_col)),
        )
        self._swap_assigned(self._assigned.unionByName(new))
        return self

    # delete-bitmap analog — shared body with the float family (both
    # touch only _assigned/_swap_assigned/id_col), like _swap_assigned
    remove = IVFFlatIndex.remove
    unpersist = IVFFlatIndex.unpersist

    def probe_cells(self, query_code: Sequence[int], nprobe: int | None = None) -> list[int]:
        if self.centroids is None:
            raise SearchError("index not trained")
        nprobe = self.nprobe if nprobe is None else int(nprobe)
        if nprobe <= 0:
            raise SearchError(f"nprobe must be positive, got {nprobe}")
        q = np.asarray(query_code, dtype=np.uint8)[None, :]
        d = _hamming_to_centroids(q, self.centroids)[0]
        return [int(c) for c in np.argsort(d, kind="stable")[:nprobe]]

    def search(
        self,
        df: DataFrame,  # unused: the assigned table is the index
        query_code: Sequence[int],
        limit: int = 50,
        flt: Column | None = None,
        nprobe: int | None = None,
        min_score: float | None = None,
        max_score: float | None = None,
        offset: int = 0,
        output_fields: list[str] | None = None,
        score_col: str = "_score",
        **_: object,  # l2_sqrt/vector_value: no meaning in Hamming space
    ) -> DataFrame:
        """Top-k by Hamming distance, ascending, ties broken by id —
        the probed cells prune the scan, the distance itself is the
        JVM ``bit_count(xor)`` fold (functions/distance.py).
        ``min_score``/``max_score`` band the Hamming distance like any
        other score (IsSimilarScoreValid gamma_common_data.h:94-96)."""
        from vearch_spark.functions.distance import hamming_distance

        if self._assigned is None:
            raise SearchError("index not trained")
        cells = self.probe_cells(query_code, nprobe)
        pruned = self._assigned.where(F.col(CLUSTER_COL).isin(cells))
        if flt is not None:
            pruned = pruned.where(flt)
        scored = pruned.withColumn(
            score_col,
            hamming_distance(F.col(self.code_col), [int(b) for b in query_code]),
        )
        if min_score is not None:
            scored = scored.where(F.col(score_col) >= float(min_score))
        if max_score is not None:
            scored = scored.where(F.col(score_col) <= float(max_score))
        # _id force-included like every other index (topk._output_cols,
        # doc_query.go:1450-1459)
        if output_fields is None:
            cols = [self.id_col]
        else:
            cols = list(output_fields)
            if self.id_col not in cols:
                cols.insert(0, self.id_col)
        out = scored.select(*cols, score_col).orderBy(
            F.col(score_col).asc(), F.col(self.id_col).asc()
        )
        if offset:
            out = out.offset(offset)
        return out.limit(limit)

    def search_batch(
        self,
        queries: Sequence[Sequence[int]],
        limit: int = 50,
        flt: Column | None = None,
        nprobe: int | None = None,
        score_col: str = "_score",
        **_: object,  # l2_sqrt: no meaning in Hamming space
    ) -> DataFrame:
        """Batched multi-query Hamming ANN — the reference's req_num
        parse covers BINARYIVF too (parseVectors doc_query.go:296-309:
        q×(d/8) byte codes split per query). Same physical shape as
        :meth:`IVFFlatIndex.search_batch`: broadcast (query_id, cell,
        query_code) probe relation joined on ``_cluster_id`` prunes the
        scan to the probed cells; per-query top-k is a rank window
        (map-side limited by WindowGroupLimit). Returns
        (query_id, id, score) rows."""
        from pyspark.sql import Window

        from vearch_spark.functions.distance import hamming_distance

        if self._assigned is None:
            raise SearchError("index not trained")
        spark = self._assigned.sparkSession
        probe_rows = [
            (qid, cell, [int(b) for b in q])
            for qid, q in enumerate(queries)
            for cell in self.probe_cells(q, nprobe)
        ]
        probes = spark.createDataFrame(
            probe_rows, f"query_id int, {CLUSTER_COL} int, query_code array<int>"
        )
        pruned = self._assigned
        if flt is not None:
            pruned = pruned.where(flt)
        joined = pruned.join(F.broadcast(probes), on=CLUSTER_COL)
        scored = joined.withColumn(
            score_col, hamming_distance(F.col(self.code_col), F.col("query_code"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col(score_col).asc(), F.col(self.id_col).asc()
        )
        return (
            scored.withColumn("_rank", F.row_number().over(w))
            .where(F.col("_rank") <= limit)
            .select("query_id", self.id_col, score_col)
        )

    def save(self, path: str) -> None:
        import json as _json
        import os

        if self._assigned is None or self.centroids is None:
            raise SearchError("index not trained")
        os.makedirs(path, exist_ok=True)
        self._assigned.write.mode("overwrite").partitionBy(CLUSTER_COL).parquet(
            os.path.join(path, "assigned")
        )
        np.save(os.path.join(path, "centroids.npy"), self.centroids)
        with open(os.path.join(path, "params.json"), "w") as fh:
            _json.dump(
                {
                    "code_col": self.code_col,
                    "ncentroids": self.ncentroids,
                    "nprobe": self.nprobe,
                    "id_col": self.id_col,
                },
                fh,
            )

    @classmethod
    def load(cls, spark, path: str) -> "BinaryIVFIndex":
        import json as _json
        import os

        with open(os.path.join(path, "params.json")) as fh:
            params = _json.load(fh)
        idx = cls(**params)
        idx.centroids = np.load(os.path.join(path, "centroids.npy"))
        idx._assigned = spark.read.parquet(os.path.join(path, "assigned"))
        return idx


# --- Two-level coarse quantizer (the >64k-centroid scale path) -------------


def _nearest_cell2_udf(l1: np.ndarray, l2: np.ndarray):
    """Hierarchical cell assignment: argmin over the k1 level-1
    centroids, then argmin over that cell's k2 sub-centroids — O(k1 +
    k2) distance rows per vector instead of O(k1·k2). Batches group by
    the level-1 cell so the sub-centroid matmul runs per GROUP, never
    materializing an (n, k2, dim) gather."""
    from pyspark.sql.pandas.functions import pandas_udf

    a = np.ascontiguousarray(l1, dtype=np.float64)
    a2 = (a**2).sum(axis=1)
    b = np.ascontiguousarray(l2, dtype=np.float64)  # (k1, k2, dim)
    k2 = b.shape[1]

    @pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        c1 = (a2 - 2.0 * (x @ a.T)).argmin(axis=1)
        out = np.empty(len(x), dtype=np.int64)
        for c in np.unique(c1):
            idx = np.nonzero(c1 == c)[0]
            cc = b[c]
            d = (cc**2).sum(axis=1)[None, :] - 2.0 * (x[idx] @ cc.T)
            out[idx] = int(c) * k2 + d.argmin(axis=1)
        return pd.Series(out.astype(np.int32))

    return assign


class TwoLevelIVFFlatIndex(IVFFlatIndex):
    """IVFFLAT with a two-level (hierarchical) coarse quantizer —
    the cell-count scale path.

    A flat coarse quantizer stops scaling around ~64k centroids: the
    driver-side probe ordering is O(ncentroids·dim) per query, and
    Lloyd's with k approaching the bounded training-sample size is
    ill-posed. At 100 TB (~10^11 rows) the sqrt(n) sizing rule wants
    ~10^5–10^6 cells. The classic fix (faiss's IMI / hierarchical
    coarse quantizers) is a centroid TREE: k1 level-1 cells, each with
    k2 sub-centroids trained on the cell's residents, giving k1·k2
    addressable cells while probe selection touches only
    O(k1 + nprobe_l1·k2) centroid distances and assignment O(k1 + k2)
    rows per vector.

    Everything downstream is untouched: the index is still one
    ``_cluster_id`` column (cell id = c1·k2 + c2), storage still
    ``partitionBy(_cluster_id)``, search still ``cell IN (probes)`` +
    the exact FLAT kernel — only the quantizer that NAMES the cells is
    hierarchical. Reference analog: the IVF skeleton of
    gamma_index_ivfflat.cc with a composite coarse quantizer.
    """

    def __init__(
        self,
        vector_col: str,
        metric: Metric = Metric.L2,
        ncentroids_l1: int = 256,
        ncentroids_l2: int = 64,
        nprobe: int = 32,
        nprobe_l1: int | None = None,
        id_col: str = ID_FIELD,
        seed: int = 42,
        coarse_train_sample: int = 262_144,
        l2_fit: str = "auto",
        **kw: object,
    ):
        super().__init__(
            vector_col,
            metric,
            ncentroids=ncentroids_l1 * ncentroids_l2,
            nprobe=nprobe,
            id_col=id_col,
            seed=seed,
            coarse_train_sample=coarse_train_sample,
            **kw,
        )
        if l2_fit not in ("auto", "driver", "distributed"):
            raise SearchError(f"l2_fit must be auto|driver|distributed, got {l2_fit!r}")
        self.l2_fit = l2_fit
        self.k1 = int(ncentroids_l1)
        self.k2 = int(ncentroids_l2)
        # enough level-1 beams that nprobe cells are reachable, plus
        # slack for boundary effects
        self.nprobe_l1 = int(nprobe_l1 or max(4, (nprobe + self.k2 - 1) // self.k2 * 2))
        self.l1_centroids: np.ndarray | None = None
        self.l2_centroids: np.ndarray | None = None  # (k1, k2, dim)
        self.l2_valid: np.ndarray | None = None  # (k1, k2) bool

    #: below this many level-1 cells the per-cell fits run as the plain
    #: driver loop — a Spark job's fixed overhead would dominate, and
    #: both paths are bit-identical anyway (same order, same seeds)
    _L2_DISTRIBUTED_MIN_CELLS = 64

    def _fit_l2_cells(
        self, spark, x: np.ndarray, a1: np.ndarray, k1: int
    ) -> dict[int, np.ndarray]:
        """Level-2 KMeans for every populated level-1 cell. The k1 fits
        are INDEPENDENT, so at real cell counts (k1 = 1024-4096 for the
        10^5-10^6-cell regime) they run as ONE grouped Arrow job —
        `groupBy(c1).applyInPandas` — instead of a sequential driver
        loop (which was the fit wall-time at k1=4096: ~20 s of
        single-core numpy). Bit-identical to the driver loop by
        construction: each group re-sorts its rows by sample index
        (restoring the exact slice order `x[a1 == c]` yields) and uses
        the same per-cell seed, so `ivf2_knn` hashes are unchanged
        whichever path ran."""
        k2, base_seed = self.k2, self.seed
        distributed = self.l2_fit == "distributed" or (
            self.l2_fit == "auto" and k1 >= self._L2_DISTRIBUTED_MIN_CELLS
        )
        if not distributed or spark is None:
            return {
                c: _kmeans_np(
                    x[a1 == c], min(k2, int((a1 == c).sum())), iters=10,
                    seed=base_seed + 1000 + c,
                )
                for c in range(k1)
                if (a1 == c).any()
            }
        import pandas as pd

        pdf = pd.DataFrame({
            "c1": a1.astype("int32"),
            "i": np.arange(len(x), dtype="int64"),
            "vec": [row.tolist() for row in x],
        })
        sdf = spark.createDataFrame(pdf, schema="c1 int, i long, vec array<double>")

        def fit_cell(g: "pd.DataFrame") -> "pd.DataFrame":
            c = int(g["c1"].iloc[0])
            g = g.sort_values("i")
            sub = np.array(g["vec"].tolist(), dtype=np.float64)
            cents = _kmeans_np(sub, min(k2, len(sub)), iters=10,
                               seed=base_seed + 1000 + c)
            return pd.DataFrame({
                "c1": np.full(len(cents), c, dtype="int32"),
                "c2": np.arange(len(cents), dtype="int32"),
                "cent": [list(map(float, row)) for row in cents],
            })

        rows = (
            sdf.groupBy("c1")
            .applyInPandas(fit_cell, "c1 int, c2 int, cent array<double>")
            .collect()  # k1*k2 centroid rows — model-sized, not data-sized
        )
        by_cell: dict[int, dict[int, list]] = {}
        for r in rows:
            by_cell.setdefault(r["c1"], {})[r["c2"]] = r["cent"]
        return {
            c: np.array([m[j] for j in sorted(m)], dtype=np.float64)
            for c, m in by_cell.items()
        }

    def _fit_coarse(self, df: DataFrame) -> np.ndarray:
        x = self._train_sample(df)
        dim = x.shape[1]
        k1 = max(1, min(self.k1, len(x)))
        l1 = _kmeans_np(x, k1, iters=20, seed=self.seed)
        a1 = ((l1**2).sum(axis=1)[None, :] - 2.0 * (x @ l1.T)).argmin(axis=1)
        fitted = self._fit_l2_cells(df.sparkSession, x, a1, k1)
        l2 = np.empty((k1, self.k2, dim), dtype=np.float64)
        valid = np.ones((k1, self.k2), dtype=bool)
        for c in range(k1):
            cents = fitted.get(c)
            if cents is None:
                # empty cell: its only sub-centroid is the l1 centroid
                # itself (the driver loop's `sub = l1[c][None, :]` case)
                cents = _kmeans_np(l1[c][None, :], 1, iters=10,
                                   seed=self.seed + 1000 + c)
            if len(cents) < self.k2:
                # pad under-populated cells with far sentinels so the
                # L2 assignment argmin never picks them; the explicit
                # validity mask below additionally keeps them out of
                # PROBE slots (probe ranking is L2 too, but the mask
                # makes the exclusion independent of sentinel distance)
                valid[c, len(cents):] = False
                pad = np.full((self.k2 - len(cents), dim), 1.0e6)
                pad += np.arange(len(pad))[:, None]  # distinct rows
                cents = np.vstack([cents, pad])
            l2[c] = cents
        self.k1 = k1
        self.l1_centroids, self.l2_centroids = l1, l2
        self.l2_valid = valid
        # flattened view keeps the base-class contract (save(), ncentroids)
        self.centroids = l2.reshape(k1 * self.k2, dim)
        self._assigned = df.withColumn(
            CLUSTER_COL, self._assign_udf()(F.col(self.vector_col))
        )
        return x

    def _assign_udf(self):
        if self.l1_centroids is None or self.l2_centroids is None:
            raise SearchError("index not trained")
        return _nearest_cell2_udf(self.l1_centroids, self.l2_centroids)

    def probe_cells(self, query, nprobe: int | None = None) -> list[int]:
        """Hierarchical probe: rank level-1 cells, expand the best
        ``nprobe_l1`` into their sub-centroids, take the globally best
        ``nprobe`` cell ids among the expanded O(nprobe_l1·k2) — never
        touching the other (k1−nprobe_l1)·k2 centroids. Always L2 cell
        ranking, matching the L2 assignment geometry (see
        ``_query_cell_order``)."""
        if self.l1_centroids is None or self.l2_centroids is None:
            raise SearchError("index not trained")
        q = np.asarray(query, dtype=np.float64)
        nprobe = self.nprobe if nprobe is None else int(nprobe)
        if nprobe <= 0:
            raise SearchError(f"nprobe must be positive, got {nprobe}")
        d1 = ((self.l1_centroids - q) ** 2).sum(axis=1)
        top1 = np.argsort(d1)[: self.nprobe_l1]
        sub = self.l2_centroids[top1]  # (w1, k2, dim)
        d2 = ((sub - q) ** 2).sum(axis=2)
        if self.l2_valid is not None:
            d2 = np.where(self.l2_valid[top1], d2, np.inf)  # mask pad cells
        flat = d2.ravel()
        order = np.argsort(flat)[:nprobe]
        w1_idx, c2 = np.divmod(order, self.k2)
        return [int(top1[i]) * self.k2 + int(j) for i, j in zip(w1_idx, c2)]

    def save(self, path: str) -> None:
        import json as _json
        import os

        super().save(path)
        np.save(os.path.join(path, "l1_centroids.npy"), self.l1_centroids)
        np.save(os.path.join(path, "l2_centroids.npy"), self.l2_centroids)
        np.save(os.path.join(path, "l2_valid.npy"), self.l2_valid)
        with open(os.path.join(path, "two_level.json"), "w") as fh:
            _json.dump({"k1": self.k1, "k2": self.k2,
                        "nprobe_l1": self.nprobe_l1}, fh)

    @classmethod
    def load(cls, spark, path: str) -> "TwoLevelIVFFlatIndex":
        import json as _json
        import os

        base = IVFFlatIndex.load(spark, path)
        with open(os.path.join(path, "two_level.json")) as fh:
            tl = _json.load(fh)
        idx = cls(
            base.vector_col,
            base.metric,
            ncentroids_l1=tl["k1"],
            ncentroids_l2=tl["k2"],
            nprobe=base.nprobe,
            nprobe_l1=tl["nprobe_l1"],
            id_col=base.id_col,
        )
        idx.l1_centroids = np.load(os.path.join(path, "l1_centroids.npy"))
        idx.l2_centroids = np.load(os.path.join(path, "l2_centroids.npy"))
        idx.l2_valid = np.load(os.path.join(path, "l2_valid.npy"))
        idx.centroids = base.centroids
        idx._assigned = base._assigned
        return idx
