"""Multimodal column plumbing (decode is a deterministic stub)."""

import pytest

from vearch_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("img1", "image", b"\x01\x02\x03", "image/png", 640, 480, None),
        ("img2", "image", b"\x01\x02\x03", "image/png", 640, 480, None),  # same bytes
        ("img3", "image", b"\xff\xfe", "image/jpeg", 800, 600, None),
        ("vid1", "video", b"\x00" * 16, "video/mp4", 1920, 1080, 5500),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_extract_features_shape(media_df):
    out = mm.extract_features(media_df, feature_dim=16)
    rows = {r.media_id: r.feature for r in out.collect()}
    assert len(rows) == 4
    assert all(len(v) == 16 for v in rows.values())
    # deterministic: same bytes → same features; different bytes differ
    assert rows["img1"] == rows["img2"]
    assert rows["img1"] != rows["img3"]
    assert all(0.0 <= x < 1.0 for x in rows["img1"])


def test_extract_features_carry_cols(media_df):
    """carry_cols ride the Arrow batch unchanged (typed per the input
    schema), so downstream grouping needs no join back to the input."""
    out = mm.extract_features(media_df, feature_dim=8, carry_cols=("mime", "width"))
    assert out.columns == ["media_id", "feature", "mime", "width"]
    rows = {r.media_id: r for r in out.collect()}
    assert rows["img3"].mime == "image/jpeg" and rows["img3"].width == 800
    # features themselves are identical to the plain form
    plain = {r.media_id: r.feature for r in mm.extract_features(
        media_df, feature_dim=8).collect()}
    assert all(rows[k].feature == plain[k] for k in plain)


def test_features_feed_topk(media_df):
    """Extracted features plug straight into the search kernel."""
    from vearch_spark.operators import topk

    feats = mm.extract_features(media_df, feature_dim=16)
    q = feats.where("media_id = 'img1'").collect()[0].feature
    out = topk.search(feats, "feature", [float(x) for x in q], limit=2, id_col="media_id")
    hits = [r.media_id for r in out.collect()]
    assert set(hits[:2]) == {"img1", "img2"}  # identical content ranks first


def test_frame_sample(media_df):
    out = mm.frame_sample(media_df, every_ms=1000)
    frames = out.where("media_id = 'vid1'").orderBy("frame_no").collect()
    assert [f.frame_no for f in frames] == [0, 1, 2, 3, 4]
    assert frames[3].ts_ms == 3000


def test_custom_decoder_registration(spark):
    import numpy as np

    mm.register_decoder("audio", lambda b: np.frombuffer(b, dtype=np.uint8) / 255.0)
    try:
        df = spark.createDataFrame(
            [("a1", "audio", bytes(range(32)), "audio/wav", None, None, 2000)],
            mm.MEDIA_SCHEMA,
        )
        out = mm.extract_features(df, kind="audio", feature_dim=32)
        feat = out.collect()[0].feature
        assert feat[0] == pytest.approx(0.0) and feat[31] == pytest.approx(31 / 255.0)
    finally:
        mm._DECODERS.pop("audio", None)


def test_null_content_yields_null_feature(spark):
    """One failed fetch (NULL content) must not abort the job — the row
    emits a NULL feature."""
    df = spark.createDataFrame(
        [("m1", "image", None), ("m2", "image", b"xyz")],
        "media_id string, kind string, content binary",
    )
    out = {r.media_id: r.feature for r in mm.extract_features(df).collect()}
    assert out["m1"] is None
    assert out["m2"] is not None and len(out["m2"]) == 64
