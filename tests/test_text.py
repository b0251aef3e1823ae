import pytest
from pyspark.sql import functions as F

from vearch_spark.functions import text as T


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (0, "the cat is on the mat and it is happy"),
            (1, "der hund ist nicht auf der matte und das ist gut"),
            (2, "el gato es un animal que vive en la casa"),
            (3, "12345 !!! ??? 678"),
            (4, "word " * 30),
        ],
        "id long, text string",
    )


def get(df, col, i):
    return {r.id: r.v for r in df.select("id", col.alias("v")).collect()}[i]


def test_token_count(df):
    assert get(df, T.token_count("text"), 0) == 10
    assert get(df, T.char_count("text"), 0) == len("the cat is on the mat and it is happy")


def test_punct_and_digit_ratio(df):
    assert get(df, T.punct_ratio("text"), 0) == 0.0
    assert get(df, T.punct_ratio("text"), 3) == pytest.approx(6 / 17)
    assert get(df, T.digit_ratio("text"), 3) == pytest.approx(8 / 17)


def test_stopword_ratio(df):
    # "the" x2, "is" x2, "on"? not in list, "and", "it" → 6 of 10
    assert get(df, T.stopword_ratio("text", "en"), 0) == pytest.approx(6 / 10)


def test_lang_id(df):
    assert get(df, T.lang_id("text"), 0) == "en"
    assert get(df, T.lang_id("text"), 1) == "de"
    assert get(df, T.lang_id("text"), 2) == "es"
    # no stopwords at all → tie at 0 → lexicographically first ("de")
    assert get(df, T.lang_id("text"), 3) == "de"


def test_quality_score_bounds(df):
    vals = [r.v for r in df.select(T.quality_score("text").alias("v")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    # clean 30-token text beats punctuation soup
    assert get(df, T.quality_score("text"), 4) > get(df, T.quality_score("text"), 3)


def test_doc_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, "a b c d e f g"), (2, "x y z w v u t")],
        "id long, text string",
    )
    fps = {r.id: r.v for r in df.select("id", T.doc_fingerprint("text", 3).alias("v")).collect()}
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]
    assert len(fps[0]) == 32  # md5 hex


def test_bpe_tokens(spark):
    from pyspark.sql import functions as F

    from vearch_spark.functions.text import bpe_token_count, bpe_tokens

    df = spark.createDataFrame(
        [("It's a test, isn't it? 42 times!",), ("",)], "text string"
    )
    got = df.select(bpe_tokens("text").alias("t"), bpe_token_count("text").alias("n")).collect()
    assert got[0].t == [
        "It", "'s", "a", "test", ",", "isn", "'t", "it", "?", "42", "times", "!",
    ]
    assert got[0].n == 12
    assert got[1].n == 0
