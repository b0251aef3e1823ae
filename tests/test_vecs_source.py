"""fvecs/ivecs source parity (data_utils.py:38-45 formats): write the
TEXMEX wire format with numpy, read it back distributed."""

import numpy as np
import pytest


def write_vecs(path, mat, dtype):
    n, d = mat.shape
    with open(path, "wb") as fh:
        for row in mat:
            fh.write(np.int32(d).tobytes())
            fh.write(np.asarray(row, dtype=dtype).tobytes())


def test_read_fvecs_multi_file(spark, tmp_path):
    from vearch_spark.sources.vecs import read_fvecs

    rng = np.random.default_rng(3)
    a = rng.normal(size=(10, 8)).astype(np.float32)
    b = rng.normal(size=(6, 8)).astype(np.float32)
    write_vecs(tmp_path / "part0.fvecs", a, np.float32)
    write_vecs(tmp_path / "part1.fvecs", b, np.float32)

    df = read_fvecs(spark, str(tmp_path))
    rows = {r.vec_id: np.asarray(r.vector, dtype=np.float32) for r in df.collect()}
    assert len(rows) == 16
    # global ids follow path order with cumulative offsets
    full = np.vstack([a, b])
    for i in range(16):
        assert np.array_equal(rows[i], full[i])


def test_read_ivecs_groundtruth(spark, tmp_path):
    from vearch_spark.sources.vecs import read_ivecs

    gt = np.array([[3, 1, 2], [0, 5, 4]], dtype=np.int32)
    write_vecs(tmp_path / "gt.ivecs", gt, np.int32)
    df = read_ivecs(spark, str(tmp_path))
    rows = sorted((r.vec_id, list(r.vector)) for r in df.collect())
    assert rows == [(0, [3, 1, 2]), (1, [0, 5, 4])]


def test_bad_stride_rejected(spark, tmp_path):
    from vearch_spark.sources.vecs import read_fvecs

    with open(tmp_path / "bad.fvecs", "wb") as fh:
        fh.write(np.int32(4).tobytes())
        fh.write(np.zeros(3, dtype=np.float32).tobytes())  # truncated
    with pytest.raises(ValueError):
        read_fvecs(spark, str(tmp_path))
