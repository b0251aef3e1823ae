"""The IVF oracle (VERDICT r01 item 5) rests on one invariant: the
pyarrow/numpy recomputation in ``ivf_oracle`` is bit-identical to the
Spark-side index fit. These tests pin that invariant at sf0.001/sf0.01
so an oracle drift (row-order change, dtype widening change, kmeans
edit) fails here before it fails the driver's hash compare."""

from __future__ import annotations

import numpy as np
import pytest

import __spark_entry__ as entry
from vearch_spark.operators.ivf_oracle import (
    binary_centroids,
    binary_probe_cells,
    float_centroids,
    float_probe_cells,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def flat_index(spark):
    return entry._ivf_index(spark, SF, "ivfflat")


@pytest.fixture(scope="module")
def binary_index(spark):
    return entry._ivf_index(spark, SF, "binaryivf")


def test_float_centroids_bit_identical(flat_index):
    cents = float_centroids(SF)
    assert cents.dtype == np.float64
    assert np.array_equal(flat_index.centroids, cents)


def test_pq_and_rabitq_share_coarse_centroids(spark, flat_index):
    # one Lloyd's run serves every float-IVF oracle: same seed, same
    # params, same column ⇒ same centroids
    pq = entry._ivf_index(spark, SF, "ivfpq")
    rbq = entry._ivf_index(spark, SF, "ivfrabitq")
    assert np.array_equal(pq.centroids, flat_index.centroids)
    assert np.array_equal(rbq.centroids, flat_index.centroids)


def test_float_probe_cells_match_index(flat_index):
    cents = float_centroids(SF)
    for nprobe in (1, 4, 6, 12):
        assert flat_index.probe_cells(entry.QV_L2, nprobe) == float_probe_cells(
            cents, entry.QV_L2, nprobe
        )
    assert flat_index.probe_cells(entry.QV_F2, 6) == float_probe_cells(
        cents, entry.QV_F2, 6
    )


def test_binary_centroids_bit_identical(binary_index):
    bcents = binary_centroids(SF)
    assert bcents.dtype == np.uint8
    assert np.array_equal(binary_index.centroids, bcents)


def test_binary_probe_cells_match_index(binary_index):
    bcents = binary_centroids(SF)
    qcode = [
        sum((1 << b) if entry.QV_L2[j * 8 + b] > 0.5 else 0 for b in range(8))
        for j in range(entry.DIM // 8)
    ]
    assert binary_index.probe_cells(qcode, 8) == binary_probe_cells(bcents, qcode, 8)


def test_two_level_centroids_bit_identical(spark):
    from vearch_spark.operators.ivf_oracle import (
        two_level_centroids,
        two_level_probe_cells,
    )

    idx = entry._ivf_index(spark, SF, "ivf2")
    l1, l2, valid = two_level_centroids(SF, k1=4, k2=4)
    assert np.array_equal(idx.l1_centroids, l1)
    assert np.array_equal(idx.l2_centroids, l2)
    assert np.array_equal(idx.l2_valid, valid)
    assert idx.probe_cells(entry.QV_L2, 6) == two_level_probe_cells(
        l1, l2, valid, entry.QV_L2, nprobe=6, nprobe_l1=idx.nprobe_l1
    )


def test_ivf_oracle_sql_builds_for_default_sf():
    # the builder must produce SQL for all five keys without a Spark
    # session (the driver may call oracle_sql() in a plain process)
    sqls = entry._ivf_oracle_sql()
    assert set(sqls) == {
        "ivfflat_knn",
        "ivfpq_knn",
        "scann_knn",
        "ivfrabitq_knn",
        "ivf2_knn",
        "ivf_batch_knn",
        "binaryivf_knn",
        "cluster_sample",
    }
    for s in sqls.values():
        assert "cid" in s and "row_number" in s
