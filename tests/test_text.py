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
    # no stopwords at all → zero signal → NULL (unknown), never a
    # confident wrong guess
    assert get(df, T.lang_id("text"), 3) is None


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


def test_chunk_spans_overlap_and_reconstruction(spark):
    """Chunk i starts at i·stride; consecutive chunks share `overlap`
    tokens; dropping each chunk's first `overlap` tokens (after chunk
    0) reconstructs the document."""
    import pytest as _pytest

    from vearch_spark.functions.text import chunk_spans

    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(text,)], "text string")
    rows = (
        df.select(F.explode(chunk_spans("text", chunk_size=30, overlap=10)).alias("c"))
        .select("c.*")
        .collect()
    )
    # stride 20, n=100 -> ceil(100/20)=5 chunks
    assert [r.chunk_idx for r in rows] == [0, 1, 2, 3, 4]
    assert [r.n_tokens for r in rows] == [30, 30, 30, 30, 20]
    for prev, cur in zip(rows, rows[1:]):
        assert prev.chunk_text.split()[-10:] == cur.chunk_text.split()[:10]
    rebuilt = rows[0].chunk_text.split()
    for r in rows[1:]:
        rebuilt += r.chunk_text.split()[10:]
    assert rebuilt == text.split()

    with _pytest.raises(ValueError):
        chunk_spans("text", chunk_size=10, overlap=10)


def test_redact_pii(spark):
    from vearch_spark.functions.text import redact_pii
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com  and  10.0.0.1 call +1 555-123-4567 now"),
            (2, "clean text no pii"),
        ],
        "id long, text string",
    )
    out = {r.id: r for r in df.select("id", redact_pii("text").alias("r")).select("id", "r.*").collect()}
    assert out[1].n_emails == 1 and out[1].n_ips == 1 and out[1].n_phones == 1
    assert out[1].redacted == "mail <EMAIL> and <IP> call <PHONE> now"
    assert out[2].n_emails == out[2].n_ips == out[2].n_phones == 0
    assert out[2].redacted == "clean text no pii"


def test_redact_gram_stats_matches_jvm_chain(spark):
    """r10: the fused Arrow normalize+redact+gram kernel is byte-equal
    to the JVM regexp chain + gram_stats it replaced in corpus_pipeline
    on every input whose PII-adjacent characters are ASCII — including
    NBSP whitespace edges (\\s is ASCII on BOTH engines) and unicode
    text away from the match sites. Where a digit abuts a non-ASCII
    codepoint, Java's \\b is unicode-classed while RE2 — the DuckDB
    oracle that defines the declared query's results — is ASCII-classed
    like the kernel's re.ASCII, so the kernel follows the ORACLE there
    (second block pins those cases explicitly)."""
    from vearch_spark.functions.text import (
        gram_stats,
        redact_gram_stats,
        redact_pii,
    )

    rows = [
        (1, "mail bob@example.com  and  10.0.0.1 call +1 555-123-4567 now"),
        (2, "clean text no pii"),
        (3, "ip glued to a letter 10.0.0.1x stays"),
        (4, "\xa0 leading nbsp 1.2.3.4 trailing nbsp\xa0 "),
        (5, "tabs\tand\nnewlines   collapse 999-123 4567 890"),
        (6, "a b c a b c a b c repeated grams"),
        (7, ""),
        (8, "unicode w\u00f6rd m\u00fcller@example.com t\u00e9st"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    jvm = {
        r.id: r
        for r in df.select(
            "id",
            redact_pii("text").getField("redacted").alias("redacted"),
            gram_stats(redact_pii("text").getField("redacted")).alias("g"),
        ).collect()
    }
    fused = {
        r.id: r
        for r in df.select("id", redact_gram_stats("text").alias("s"))
        .select("id", "s.*")
        .collect()
    }
    for i, _ in rows:
        assert fused[i].redacted == jvm[i].redacted, (i, fused[i], jvm[i])
        assert fused[i].n_tokens == jvm[i].g.n_tokens, i
        assert fused[i].n_grams == jvm[i].g.n_grams, i
        assert fused[i].n_dup_grams == jvm[i].g.n_dup_grams, i

    # oracle-semantics pins: ASCII \\b (RE2/DuckDB, re.ASCII) treats a
    # non-ASCII letter and a combining mark as non-word -> boundary ->
    # redact; Java's unicode \\b would keep both. \u00bd (No category)
    # is non-word in both ASCII classes -> redact on either engine.
    exotic = [
        (10, "x 10.0.0.2\u00e9 y"),
        (11, "x 1.2.3.4\u0301 y"),
        (12, "x 1.2.3.4\u00bd y"),
    ]
    got = {
        r.id: r.s.redacted
        for r in spark.createDataFrame(exotic, "id long, text string")
        .select("id", redact_gram_stats("text").alias("s"))
        .collect()
    }
    assert got[10] == "x <IP>\u00e9 y"
    assert got[11] == "x <IP>\u0301 y"
    assert got[12] == "x <IP>\u00bd y"


def test_dedup_lines_and_fraction(spark):
    from pyspark.sql import functions as F

    from vearch_spark.functions.text import dedup_lines, dup_line_fraction

    df = spark.createDataFrame(
        [("a\nb\na\nc\nb",), ("x\ny",), ("same\nsame\nsame",)], "t string"
    )
    rows = df.select(
        dedup_lines("t").alias("d"), dup_line_fraction("t").alias("f")
    ).collect()
    assert rows[0].d == "a\nb\nc" and rows[0].f == pytest.approx(2 / 5)
    assert rows[1].d == "x\ny" and rows[1].f == 0.0
    assert rows[2].d == "same" and rows[2].f == pytest.approx(2 / 3)


def test_lang_id_detects_unsegmented_chinese(spark):
    """zh votes by character membership: unsegmented Chinese never
    space-splits into the profile, so token membership scored 0 and the
    text fell through to the zero-signal path."""
    df = spark.createDataFrame([("我是中国人这是不了",)], "text string")
    assert df.select(T.lang_id("text").alias("v")).first().v == "zh"


def test_chunk_spans_no_contained_trailing_chunk(spark):
    """A trailing remainder <= overlap is wholly inside the previous
    chunk — emitting it duplicates content."""
    text = " ".join(f"w{i}" for i in range(105))
    df = spark.createDataFrame([(text,)], "text string")
    chunks = df.select(
        F.explode(T.chunk_spans("text", chunk_size=30, overlap=10)).alias("c")
    ).select("c.*").collect()
    # starts 0,20,40,60,80 — the start-100 remainder (5 <= 10) is dropped
    assert [c.chunk_idx for c in chunks] == [0, 1, 2, 3, 4]
    assert chunks[-1].n_tokens == 25  # [80, 105)
    joined = " ".join(c.chunk_text for c in chunks)
    assert "w104" in joined  # the tail is still covered


def test_html_to_text_strips_elements_entities_whitespace(spark):
    """html_to_text: script/style elements drop WITH contents (a decoy
    '<p>' inside script must not survive), comments drop, tags strip,
    the five core entities decode with &amp; LAST ('&amp;lt;' yields
    the literal '&lt;'), whitespace collapses. Pure JVM regex."""
    from vearch_spark.functions.text import html_to_text

    cases = [
        (
            '<html><head><script type="text/javascript">var x = "<p>not text</p>";'
            "</script><style>p { color: red; }</style></head><body><!-- comment -->"
            "<h1>Title</h1><p>hello &amp;lt; world &quot;q&quot; &#39;a&#39;&nbsp;&gt;</p></body></html>",
            "Title hello &lt; world \"q\" 'a' >",
        ),
        ("no tags at all", "no tags at all"),
        ("<p>unclosed", "unclosed"),
        ("<SCRIPT>UPPER.case()</SCRIPT>after", "after"),
        ("a  \n\t b", "a b"),
        ("<br/><img src='x'>text<hr >", "text"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "html string")
    got = df.select(html_to_text("html").alias("t")).collect()
    for (h, want), r in zip(cases, got):
        assert r.t == want, h


def test_clean_unicode(spark):
    """r9 unicode hygiene: C0/C1 controls strip (tab/newline kept),
    zero-width chars strip, NBSP + typographic quotes/dashes fold to
    ASCII, ellipsis expands; plain ASCII passes through untouched."""
    from vearch_spark.functions.text import clean_unicode

    cases = [
        ("a\x07b​c", "abc"),
        ("‍﻿x", "x"),
        ("‘q’ “w”", "'q' \"w\""),
        ("a b–c—d", "a b-c-d"),
        ("wait… done", "wait... done"),
        ("tab\there\nnewline", "tab\there\nnewline"),
        ("plain ascii!", "plain ascii!"),
        ("", ""),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t string")
    got = df.select(clean_unicode("t").alias("c")).collect()
    for (t, want), r in zip(cases, got):
        assert r.c == want, repr(t)


def test_gopher_quality_flags(spark):
    """Each published Gopher rule fails on a doc crafted to violate
    exactly it, and a clean 60-word English doc passes all seven."""
    good = " ".join(
        ["the quick brown fox jumps over that lazy dog have with"] * 6
    )  # 60 words, all alpha, 2+ stop words, mean len ~4
    cases = {
        0: (good, 1),
        # word count < 50
        1: ("the short doc that we have with us", 0),
        # mean word length < 3 (single-char words), still 50+ words
        2: (" ".join(["a b c d the of"] * 10), 0),
        # symbol spam: hash ratio > 0.1
        3: (good + " " + " ".join(["#"] * 10), 0),
        # bullet lines: 2 of 3 lines bulleted -> non-bullet 1/3 < 0.9
        4: ("• one\n- two\n" + good, 0),
        # ellipsis line endings: 1 of 2 lines = 0.5 > 0.3
        5: (good + "...\nshort tail", 0),
        # alpha fraction < 0.8: 60 good words + 20 numeric
        6: (good + " " + " ".join(["123"] * 20), 0),
        # stop words: only one distinct required stop word
        7: (" ".join(["quick brown fox jump lazy dog run far the"] * 7), 0),
    }
    df = spark.createDataFrame(
        [(k, t) for k, (t, _) in cases.items()], "id int, t string"
    )
    got = {
        r.id: r
        for r in df.select(
            "id", T.gopher_quality_flags("t").alias("g")
        ).select("id", "g.*").collect()
    }
    assert got[0].passes == 1 and all(
        v == 1 for k, v in got[0].asDict().items() if k.startswith("f_")
    )
    for cid, (_, want) in cases.items():
        assert got[cid].passes == want, (cid, got[cid])
    # each violator fails the INTENDED rule
    assert got[1].f_word_count == 0
    assert got[2].f_mean_len == 0
    assert got[3].f_symbol == 0
    assert got[4].f_bullet == 0
    assert got[5].f_ellipsis == 0
    assert got[6].f_alpha == 0
    assert got[7].f_stop == 0


def test_c4_filter(spark):
    """C4 line rules (terminal punct + >=5 words) and all three page
    rules (<3 kept lines, lorem ipsum, curly brace)."""
    rows = [
        (0, "This line has five good words.\nshort one.\nno terminal punct "
            "here at all\nAnother proper sentence right here!\nAnd a third "
            "full sentence too?"),
        (1, "Good line one is here.\nGood line two is here.\nonly two "
            "kept lines."),
        (2, "Lorem Ipsum dolor sit amet okay.\nSecond fine line right "
            "here.\nThird fine line goes here.\nFourth fine line sits here."),
        (3, "function foo() { return 1; }\nGood line number one here.\n"
            "Good line number two here.\nGood line number three here."),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r.id: r
        for r in df.select("id", T.c4_filter("t").alias("c"))
        .select("id", "c.*")
        .collect()
    }
    assert got[0].n_kept == 3 and got[0].keep_page == 1
    assert got[0].clean_text.split("\n")[0] == "This line has five good words."
    assert got[1].n_kept == 2 and got[1].keep_page == 0  # < 3 sentences
    assert got[2].n_kept == 4 and got[2].keep_page == 0  # lorem ipsum
    assert got[3].n_kept == 3 and got[3].keep_page == 0  # curly brace


def test_script_profile(spark):
    """Per-script counts, first-in-list tie-break, NULL when no
    counted script appears."""
    rows = [
        (0, "hello world latin text"),
        (1, "привет мир кириллица"),
        (2, "漢字漢字 abcd"),  # han 4 vs latin 4 -> tie -> latin first
        (3, "12345 .,!"),
        (4, "한글한글한 text"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r.id: r
        for r in df.select("id", T.script_profile("t").alias("s"))
        .select("id", "s.*")
        .collect()
    }
    assert got[0].dominant_script == "latin" and got[0].n_latin == 19
    assert got[1].dominant_script == "cyrillic" and got[1].n_latin == 0
    assert got[2].n_han == 4 and got[2].n_latin == 4
    assert got[2].dominant_script == "latin"  # tie -> first in list
    assert got[3].dominant_script is None
    assert got[4].dominant_script == "hangul" and got[4].n_hangul == 5
