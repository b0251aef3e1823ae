"""Text-analysis columns for training-data pipelines.

Pure JVM expressions (token/char statistics, quality scoring, n-gram
language identification, content fingerprinting, PII redaction) with
one deliberate exception — ``gram_stats``, an Arrow-batched pandas UDF
kept where the interpreted Catalyst higher-order form re-evaluates a
non-trivial input per element (see its docstring). Designed so a
100 TB corpus pass is a single narrow projection — no shuffle at all
until an aggregation is requested.

The language-ID heuristic is a stopword-profile vote: score per
language = number of tokens in that language's tiny stopword set,
normalized by token count; argmax wins (ties → lexicographically first
language). This mirrors classic n-gram/profile LID approaches at the
"cheap pre-filter" quality point.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F

# Minimal stopword profiles (public common-word lists, truncated for a
# cheap JVM-side vote). Keys sorted at use for deterministic ties.
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "auf"],
    "en": ["the", "a", "of", "and", "is", "to", "in", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "es", "en", "un", "por", "con"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "que", "pour", "dans"],
    "zh": ["的", "是", "不", "了", "在", "有", "我", "他", "这", "中"],
}


def tokens(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.split(col, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer shape, restricted to RE2-compatible syntax
# (no lookahead) so the same pattern runs in Spark (java.util.regex) and
# the DuckDB oracle: contractions, letter runs, digit runs, symbol runs.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_tokens(text: Column | str) -> Column:
    """BPE-ish pre-tokenization: the unit a byte-pair encoder would
    merge within. A much better LLM-token-count proxy than whitespace
    splitting (which fuses punctuation into words)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(col, F.lit(BPE_TOKEN_PATTERN), 0)


def bpe_token_count(text: Column | str) -> Column:
    return F.size(bpe_tokens(text))


def char_count(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.length(col)


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    col = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(col, r"[A-Za-z0-9 ]", "")
    return F.try_divide(F.length(stripped), F.length(col))


def digit_ratio(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.try_divide(
        F.length(col) - F.length(F.regexp_replace(col, r"[0-9]", "")), F.length(col)
    )


def mean_token_length(text: Column | str) -> Column:
    t = tokens(text)
    return F.try_divide(
        F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x)), F.size(t)
    )


def stopword_count(text: Column | str, lang: str) -> Column:
    """Tokens (with multiplicity) found in ``lang``'s stopword set.
    For zh the profile is single CHARACTERS, not space-separated words
    — real Chinese text is unsegmented, so the vote counts character
    membership (split on "") instead of token membership, which could
    never match."""
    words = STOPWORDS[lang]
    col = F.col(text) if isinstance(text, str) else text
    if lang == "zh":
        return F.size(F.filter(F.split(col, ""), lambda c: c.isin(*words)))
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words)))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    return F.try_divide(stopword_count(text, lang), token_count(text))


_LANG_ID_UDF = None


def lang_id(text: Column | str) -> Column:
    """Predicted language = argmax stopword-profile vote (ties →
    lexicographically first language code). Zero signal — no profile
    matched anything (code, URLs, unsupported languages) — returns
    NULL rather than confidently tagging the text with whatever
    language sorts first.

    One Arrow-batched pass with set lookups. The equivalent Catalyst
    form (per-language ``filter``+``isin`` lambda trees folded through
    ``array_max``) re-splits the text once per language and costs ~1.1s
    of fresh-plan analysis alone at sf0.1 vs ~0.44s end-to-end here —
    the measured-UDF exception, like ``dedup.word_shingles``. Per-lang
    counts for ratio features stay JVM-side (``stopword_count``)."""
    global _LANG_ID_UDF
    col = F.col(text) if isinstance(text, str) else text
    if _LANG_ID_UDF is None:
        from pyspark.sql.pandas.functions import pandas_udf

        import re as _re

        sets = {lang: frozenset(w) for lang, w in STOPWORDS.items()}
        langs = sorted(STOPWORDS)
        # r9: one dict lookup per token instead of one set probe per
        # (token, language) — a stopword's vote list is precomputed,
        # and zh's CHARACTER membership (unsegmented text never
        # matches token-wise — same rule as stopword_count) is a
        # compiled character class scanned at C speed. Votes and the
        # strict-> first-code tie rule are unchanged.
        word2langs: dict[str, tuple] = {}
        for lang in langs:
            if lang == "zh":
                continue
            for w in sets[lang]:
                word2langs[w] = word2langs.get(w, ()) + (lang,)
        zh_re = _re.compile("[" + _re.escape("".join(sorted(sets["zh"]))) + "]")

        @pandas_udf("string")
        def lid(ts: pd.Series) -> pd.Series:
            out = []
            for t in ts:
                if t is None:
                    out.append(None)
                    continue
                cnt: dict[str, int] = {}
                for w in t.split(" "):
                    ls = word2langs.get(w)
                    if ls is not None:
                        for lang in ls:
                            cnt[lang] = cnt.get(lang, 0) + 1
                nzh = len(zh_re.findall(t))
                if nzh:
                    cnt["zh"] = nzh
                best, best_score = None, 0
                for lang in langs:
                    s = cnt.get(lang, 0)
                    if s > best_score:  # strict: ties keep the first code
                        best, best_score = lang, s
                out.append(best)
            return pd.Series(out, dtype=object)

        _LANG_ID_UDF = lid
    return _LANG_ID_UDF(col)


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation
    + sane mean token length — the cheap pre-filter a training pipeline
    runs before expensive model scoring."""
    n_tok = token_count(text)
    len_ok = F.when((n_tok >= 20) & (n_tok <= 5000), 1.0).otherwise(
        F.when(n_tok > 5000, 0.5).otherwise(n_tok.cast("double") / 20.0)
    )
    p = F.coalesce(punct_ratio(text), F.lit(0.0))
    punct_ok = F.when(p <= 0.1, 1.0).otherwise(F.greatest(F.lit(0.0), 1.0 - (p - 0.1) * 4.0))
    mtl = F.coalesce(mean_token_length(text), F.lit(0.0))
    mtl_ok = F.when((mtl >= 2.0) & (mtl <= 12.0), 1.0).otherwise(0.4)
    return F.round((len_ok * 0.4 + punct_ok * 0.4 + mtl_ok * 0.2), 6)


# The Gopher / MassiveWeb rule-based quality filter (Rae et al. 2021,
# "Scaling Language Models: ...", App. A1.1) — the published ruleset a
# crawl-curation pipeline applies before any model-based scoring. The
# 8 required stop words are the paper's list.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(text: Column | str) -> Column:
    """The seven Gopher quality rules as one struct of 0/1 flags plus
    the word count and the conjunction (``passes``):

    1. ``f_word_count``   — 50 <= words <= 100,000
    2. ``f_mean_len``     — mean word length in [3, 10]
    3. ``f_symbol``       — (# + ellipsis) to word ratio <= 0.1
    4. ``f_bullet``       — >= 90% of lines don't start with a bullet
    5. ``f_ellipsis``     — <= 30% of lines end with an ellipsis
    6. ``f_alpha``        — >= 80% of words contain a letter
    7. ``f_stop``         — >= 2 distinct required stop words present

    Pure JVM expressions — words split on ``\\s+`` (multi-line aware),
    lines on newline; the token/line arrays are let-bound via a
    single-element transform so each split runs once per row. Every
    comparison is int-over-int double division, so an independent SQL
    engine reproduces the flags bit-for-bit."""
    raw = F.col(text) if isinstance(text, str) else text

    def flags(b: Column) -> Column:
        tk, ln = b["tk"], b["ln"]
        n_hash, n_ell = b["nh"], b["ne"]
        wc = F.size(tk)
        mean_len = F.aggregate(
            tk, F.lit(0), lambda a, w: a + F.length(w)
        ) / wc.cast("double")
        sym_ratio = (n_hash + n_ell) / wc.cast("double")
        n_lines = F.size(ln)
        n_bullet = F.size(
            F.filter(
                ln,
                lambda l: l.startswith("•")
                | l.startswith("- ")
                | l.startswith("* "),
            )
        )
        n_ell_end = F.size(
            F.filter(
                ln, lambda l: l.endswith("...") | l.endswith("…")
            )
        )
        n_alpha = F.size(F.filter(tk, lambda w: w.rlike("[A-Za-z]")))
        n_stop = F.size(
            F.array_intersect(tk, F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]))
        )
        f = [
            ((wc >= 50) & (wc <= 100000)).cast("int").alias("f_word_count"),
            ((mean_len >= 3.0) & (mean_len <= 10.0)).cast("int").alias(
                "f_mean_len"
            ),
            (sym_ratio <= 0.1).cast("int").alias("f_symbol"),
            (
                (n_lines - n_bullet).cast("double") / n_lines >= 0.9
            ).cast("int").alias("f_bullet"),
            (n_ell_end.cast("double") / n_lines <= 0.3).cast("int").alias(
                "f_ellipsis"
            ),
            (n_alpha.cast("double") / wc >= 0.8).cast("int").alias("f_alpha"),
            (n_stop >= 2).cast("int").alias("f_stop"),
        ]
        passes = f[0]
        for x in f[1:]:
            passes = passes * x
        return F.struct(
            wc.alias("word_count"), *f, passes.alias("passes")
        )

    # let-bind the INPUT first (r9): the hash/ellipsis counters each
    # reference the text twice, so a non-trivial caller expression
    # (the entry's six-line envelope) was inlined 6× and re-evaluated
    # per row in this interpreted HOF projection
    def derive(col: Column) -> Column:
        n_hash = F.length(col) - F.length(
            F.replace(col, F.lit("#"), F.lit(""))
        )
        n_ell = (
            F.length(col) - F.length(F.replace(col, F.lit("..."), F.lit("")))
        ) / F.lit(3)
        return F.struct(
            F.split(col, r"\s+").alias("tk"),
            F.split(col, "\n").alias("ln"),
            n_hash.alias("nh"),
            n_ell.alias("ne"),
        )

    bound = F.transform(F.array(raw), derive)
    return F.transform(bound, flags)[0]


def c4_filter(text: Column | str, min_line_words: int = 5) -> Column:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2) as one struct:
    lines are retained only if they end in terminal punctuation
    (``.``, ``!``, ``?``, or closing double-quote) AND carry at least
    ``min_line_words`` words; the page flags record the paper's page
    drops — fewer than 3 retained lines, a ``lorem ipsum`` occurrence
    (case-insensitive), or a curly brace (code). Returns
    ``(clean_text, n_lines, n_kept, keep_page)``; pure JVM (the line
    array is let-bound so the split runs once)."""
    col = F.col(text) if isinstance(text, str) else text

    def per(b: Column) -> Column:
        ln = b["ln"]
        kept = F.filter(
            ln,
            lambda l: l.rlike('[.!?"]\\s*$')
            & (F.size(F.split(F.trim(l), " ")) >= min_line_words),
        )
        n_kept = F.size(kept)
        keep = (
            (n_kept >= 3)
            & ~F.lower(b["t"]).contains("lorem ipsum")
            & ~b["t"].contains("{")
        )
        return F.struct(
            F.array_join(kept, "\n").alias("clean_text"),
            F.size(ln).alias("n_lines"),
            n_kept.alias("n_kept"),
            keep.cast("int").alias("keep_page"),
        )

    # input let-bound (r9): the line split and the page-level rules
    # each referenced the caller's envelope expression separately
    bound = F.transform(
        F.array(col),
        lambda c: F.struct(F.split(c, "\n").alias("ln"), c.alias("t")),
    )
    return F.transform(bound, per)[0]


# Unicode script ranges counted by the script profile — BMP blocks
# matched identically by java.util.regex (\p{IsX}) and RE2 (\p{X}),
# so the DuckDB oracle reproduces the counts with the same classes.
SCRIPT_CLASSES = ["Latin", "Cyrillic", "Greek", "Arabic", "Devanagari", "Han", "Hangul"]


def script_profile(text: Column | str) -> Column:
    """Per-script character counts + the dominant script — the
    routing signal a multilingual pipeline applies before any
    language-specific processing (tokenizer choice, lang-id model,
    segmentation). Count per script = chars removed by stripping that
    script's class; dominant = argmax count (ties → first in
    SCRIPT_CLASSES order), NULL when no counted script appears.
    Pure JVM regex — narrow, no Python."""
    raw = F.col(text) if isinstance(text, str) else text
    lower = [s.lower() for s in SCRIPT_CLASSES]
    names = F.array(*[F.lit(lo) for lo in lower])

    def counts_of(col: Column) -> Column:
        counts = [
            (
                F.length(col)
                - F.length(F.regexp_replace(col, f"\\p{{Is{s}}}", ""))
            ).alias(f"n_{lo}")
            for s, lo in zip(SCRIPT_CLASSES, lower)
        ]
        return F.struct(*counts)

    # let-bind the INPUT first (r9): every per-script count references
    # the text column twice, so a non-trivial caller expression (the
    # entry's multi-script envelope) was inlined 14× — per-row
    # re-evaluation in this interpreted HOF projection AND a 14×
    # bigger tree for the analyzer; then let-bind the counts struct so
    # the argmax reads each count once — see the chunk_spans note on
    # Column-tree costs
    bound = F.transform(F.array(raw), counts_of)

    def per(b: Column) -> Column:
        arr = F.array(
            *[
                F.struct(
                    b[f"n_{lo}"].alias("n"), F.lit(-i).alias("ni")
                )
                for i, lo in enumerate(lower)
            ]
        )
        dom = F.transform(
            F.array(F.array_max(arr)),
            lambda m: F.when(
                m["n"] > 0, F.element_at(names, -m["ni"] + 1)
            ),
        )[0]
        return F.struct(
            *[b[f"n_{lo}"].alias(f"n_{lo}") for lo in lower],
            dom.alias("dominant_script"),
        )

    return F.transform(bound, per)[0]


def doc_fingerprint(text: Column | str, shingle_n: int = 5) -> Column:
    """Deterministic content fingerprint: the minimum md5 over word
    n-gram shingles (a 1-permutation minhash — stable under reordering
    of identical content, portable across engines)."""
    from vearch_spark.operators.dedup import word_shingles

    return F.array_min(
        F.transform(word_shingles(text, shingle_n), lambda sh: F.md5(sh))
    )


def chunk_spans(text: Column | str, chunk_size: int = 64, overlap: int = 16) -> Column:
    """Fixed-token chunk spans with overlap — the standard LLM-pipeline
    chunking step (context windows for training / embedding). Returns
    an array of structs (chunk_idx, n_tokens, chunk_text); chunk i
    covers tokens [i·stride, i·stride+chunk_size) with
    stride = chunk_size − overlap. Pure JVM higher-order expressions —
    narrow, no shuffle, no Python."""
    if overlap >= chunk_size:
        raise ValueError(f"overlap {overlap} must be < chunk_size {chunk_size}")
    stride = chunk_size - overlap

    # let-binding via a single-element transform: interpreted HOF
    # lambdas re-evaluate captured subexpressions per element, so
    # referencing tokens(text) directly inside the chunk lambda would
    # re-split the document per chunk — O(len²/stride) per row. Binding
    # the token array as a LAMBDA VARIABLE evaluates the split once per
    # row; inner references are O(1) variable reads.
    def per_tokens(tk: Column) -> Column:
        n = F.size(tk)
        # drop a trailing start whose remainder fits inside the
        # previous chunk's overlap (s > 0 and n − s ≤ overlap): that
        # chunk would be wholly contained in its predecessor —
        # duplicate content entering exactly the pipeline that exists
        # to remove duplicates
        starts = F.filter(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
            lambda s: (s == F.lit(0)) | ((n - s) > F.lit(overlap)),
        )
        return F.transform(
            starts,
            lambda s, i: F.struct(
                i.alias("chunk_idx"),
                F.size(F.slice(tk, s + 1, chunk_size)).alias("n_tokens"),
                F.array_join(F.slice(tk, s + 1, chunk_size), " ").alias("chunk_text"),
            ),
        )

    return F.element_at(F.transform(F.array(tokens(text)), per_tokens), 1)


# --- PII redaction (training-data cleaning) ---------------------------
# Patterns restricted to the regex subset where Java (Spark) and RE2
# (DuckDB oracle) agree: character classes, bounded quantifiers, \b.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\- ]{7,}\d"


def normalize_whitespace(text: Column | str) -> Column:
    """Collapse runs of whitespace to single spaces and trim — the
    first step of any corpus cleaning pass."""
    col = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def clean_unicode(text: Column | str) -> Column:
    """Unicode hygiene for crawled text — the cleanup pass that runs
    before tokenization so control garbage and typographic variants
    don't fragment the vocabulary: strips C0/C1 control characters
    (keeping tab/newline), strips zero-width characters (ZWSP/ZWNJ/
    ZWJ/BOM U+200B-200D, U+FEFF), folds NBSP (U+00A0) and the
    typographic quotes/dashes (U+2018/2019 → ', U+201C/201D → ",
    U+2013/2014 → -) to their ASCII forms via one translate, and
    expands the ellipsis (U+2026 → '...'). Pure JVM (translate + two
    RE2-safe regexp_replace), reproducible verbatim by a SQL oracle."""
    col = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(
        col,
        "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\u200b-\u200d\ufeff]",
        "",
    )
    c = F.translate(
        c,
        "\u00a0\u2018\u2019\u201c\u201d\u2013\u2014",
        " ''\"\"--",
    )
    return F.regexp_replace(c, "\u2026", "...")


def redact_pii(text: Column | str) -> Column:
    """Sequentially redact emails → IPv4s → phone-like digit runs,
    returning a struct of the redacted text and per-category counts.

    Sequential order matters: counting each category on the output of
    the previous redaction keeps the counts disjoint (a digit run
    inside an email local part is not also a phone). Pure JVM
    regexp_replace/regexp_count — a 100 TB pass stays a narrow
    projection inside whole-stage codegen."""
    col = F.col(text) if isinstance(text, str) else text
    t0 = normalize_whitespace(col)
    n_emails = F.regexp_count(t0, F.lit(EMAIL_RE)).cast("long")
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(t1, F.lit(IPV4_RE)).cast("long")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    n_phones = F.regexp_count(t2, F.lit(PHONE_RE)).cast("long")
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return F.struct(
        t3.alias("redacted"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )


_REDACT_GRAM_UDFS: dict[int, object] = {}


def redact_gram_stats(text: Column | str, n: int = 3) -> Column:
    """Fused normalize→redact→gram-stats in ONE Arrow batch pass:
    ``struct(redacted, n_tokens, n_grams, n_dup_grams)``.

    r10 (guide §4.2/§4.5): corpus_pipeline ran the whitespace+PII
    chain as four JVM regexp_replace passes and THEN shipped the
    redacted text to the gram_stats kernel — measured ~0.2-0.3 s per
    pass at sf0.1 (A/B: 0.765 s with the JVM chain vs 0.575 s with
    normalize only). The text already crosses the Arrow boundary for
    gram counting, so the regex chain runs here instead, compiled once
    per task. Patterns are compiled with ``re.ASCII`` so ``\\s``,
    ``\\d`` and ``\\b`` use ASCII character classes — the classes RE2
    (the DuckDB oracle that defines the declared query's results) uses
    for these patterns, and the classes Java regex uses for ``\\s`` and
    ``\\d``. The ONE construct where Java differs is ``\\b``: Java's
    boundary is unicode-classed (a digit glued to ``é`` or a combining
    mark is not a boundary there), so on such exotic inputs this kernel
    follows the ORACLE rather than the old JVM chain — measured
    byte-equal to BOTH on every document of all three driver SFs, and
    pinned by fixture tests for the ASCII cases (JVM-equal) and the
    exotic cases (oracle-semantics). Trailing/leading trim is
    ``strip(" ")``: after the ASCII ``\\s+``→space collapse only plain
    spaces can remain at the edges, and Spark's ``trim`` removes only
    those (a bare ``.strip()`` would also eat a non-ASCII NBSP the JVM
    keeps)."""
    col = F.col(text) if isinstance(text, str) else text
    if n not in _REDACT_GRAM_UDFS:
        import re

        from pyspark.sql.pandas.functions import pandas_udf

        ws = re.compile(r"\s+", re.ASCII)
        em = re.compile(EMAIL_RE, re.ASCII)
        ip = re.compile(IPV4_RE, re.ASCII)
        ph = re.compile(PHONE_RE, re.ASCII)

        @pandas_udf(
            "redacted string, n_tokens long, n_grams long, n_dup_grams long"
        )
        def rg(texts: pd.Series) -> pd.DataFrame:
            rows = []
            for t in texts:
                if t is None:
                    # JVM chain: NULL text -> NULL redacted; gram_stats
                    # counted the empty string ("" -> [""], one token)
                    rows.append((None, 1, 1, 0))
                    continue
                s = ws.sub(" ", t).strip(" ")
                s = ph.sub("<PHONE>", ip.sub("<IP>", em.sub("<EMAIL>", s)))
                toks = s.split(" ")
                hi = max(len(toks) - n, 0)
                grams = [" ".join(toks[i : i + n]) for i in range(hi + 1)]
                rows.append(
                    (s, len(toks), len(grams), len(grams) - len(set(grams)))
                )
            return pd.DataFrame(
                rows,
                columns=["redacted", "n_tokens", "n_grams", "n_dup_grams"],
            )

        # same optimizer fence as gram_stats (the gate filter would
        # otherwise clone the kernel below itself)
        _REDACT_GRAM_UDFS[n] = rg.asNondeterministic()
    return _REDACT_GRAM_UDFS[n](col)


_GRAM_STATS_UDFS: dict[int, object] = {}


def gram_stats(text: Column | str, n: int = 3) -> Column:
    """``struct(n_tokens, n_grams, n_dup_grams)`` in one Arrow batch.

    The declarative form (three references to a ``transform(...)``
    grams array) is an interpreted Catalyst higher-order expression;
    when its input is itself non-trivial (e.g. the PII-redaction regex
    chain), projection collapse inlines that input into the lambda and
    re-evaluates it per element (measured 12s vs 0.7s over 5k docs).
    Planned as a pandas UDF, the input column is materialized once per
    row and the counting is a vectorized Python pass — same trade as
    ``dedup.word_shingles``."""
    col = F.col(text) if isinstance(text, str) else text
    if n not in _GRAM_STATS_UDFS:
        from pyspark.sql.pandas.functions import pandas_udf

        @pandas_udf("n_tokens long, n_grams long, n_dup_grams long")
        def st(texts: pd.Series) -> pd.DataFrame:
            rows = []
            for t in texts:
                toks = (t or "").split(" ")
                hi = max(len(toks) - n, 0)
                grams = [" ".join(toks[i : i + n]) for i in range(hi + 1)]
                rows.append((len(toks), len(grams), len(grams) - len(set(grams))))
            return pd.DataFrame(rows, columns=["n_tokens", "n_grams", "n_dup_grams"])

        # deterministic output — the marker is an optimizer fence:
        # without it, a filter on the struct's fields is pushed below
        # the projection by substituting the UDF call into the
        # predicate, and the plan evaluates the WHOLE Arrow pass twice
        # (two ArrowEvalPython nodes, measured +0.35 s at sf0.1 in
        # corpus_pipeline). Nondeterministic expressions are never
        # substituted or reordered, so the kernel runs exactly once.
        _GRAM_STATS_UDFS[n] = st.asNondeterministic()
    return _GRAM_STATS_UDFS[n](col)


def dedup_lines(text: Column | str, sep: str = "\n") -> Column:
    """Drop repeated lines/paragraphs WITHIN a document, keeping the
    first occurrence in order — the standard within-doc cleaning rule
    (boilerplate, repeated headers/footers, generation loops). Pure JVM
    expressions: split → order-preserving distinct → join. ``sep`` is
    a LITERAL separator on both sides (F.split takes a regex, so it is
    escaped — '|' or '. ' work as written)."""
    import re

    col = F.col(text) if isinstance(text, str) else text
    return F.array_join(F.array_distinct(F.split(col, re.escape(sep))), sep)


def dup_line_fraction(text: Column | str, sep: str = "\n") -> Column:
    """Fraction of lines that are repeats of an earlier line — the
    Gopher-style repetition signal at line granularity (pairs with
    gram_stats' n-gram signals for the quality gate). ``sep`` is
    literal, as in :func:`dedup_lines`."""
    import re

    col = F.col(text) if isinstance(text, str) else text
    lines = F.split(col, re.escape(sep))
    n = F.size(lines)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        (n - F.size(F.array_distinct(lines))) / n.cast("double")
    )


def url_host(url: Column | str) -> Column:
    """Lower-cased host of a URL, pure JVM regex: strips scheme,
    userinfo, port, path, query, fragment. '' when the value isn't a
    scheme-qualified URL (matching regexp_extract's no-match
    convention, so downstream filters stay total). The pattern is
    RE2-compatible, so the DuckDB oracle runs it verbatim."""
    col = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]+@)?([^/:?#]+)", 1)
    )


def pct_normalize(s: Column | str) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, pure JVM
    expressions: decode escapes of UNRESERVED characters (ALPHA /
    DIGIT / '-' / '.' / '_' / '~' — '%41' → 'A', '%7E' → '~') and
    uppercase the hex digits of every other escape ('%2f' → '%2F'),
    so equivalent spellings of the same URL component collapse to one
    string. Malformed escapes ('%' not followed by two hex digits)
    pass through untouched. Implemented as split-on-'%' + transform —
    no Python, no lookaround, RE2-safe. The split result is let-bound
    (r9): it is referenced three times below, and higher-order
    functions keep the enclosing Project out of whole-stage codegen,
    so an inlined copy per reference re-ran the caller's whole
    upstream expression chain per row per copy."""
    col = F.col(s) if isinstance(s, str) else s

    # literal uppercase-hex → char map for the 66 unreserved characters:
    # one flat MAP literal + one element_at keeps both the node count
    # and the eval cost low (measured against a conv/char + range-
    # predicate form and a nested-lambda let form — the map wins both).
    # Built as ONE parsed expr (r9): 132 F.lit py4j round trips per
    # fresh build otherwise — all keys/values are plain ASCII, so the
    # SQL string form parses to the identical CreateMap of literals
    import string

    hexmap = F.expr(
        "map("
        + ",".join(
            f"'{format(ord(ch), '02X')}','{ch}'"
            for ch in string.ascii_letters + string.digits + "-._~"
        )
        + ")"
    )

    def fix(p: Column) -> Column:
        hh = F.upper(F.substring(p, 1, 2))
        return F.when(
            ~p.rlike(r"^[0-9A-Fa-f]{2}"), F.concat(F.lit("%"), p)
        ).otherwise(
            F.concat(
                F.coalesce(
                    F.element_at(hexmap, hh), F.concat(F.lit("%"), hh)
                ),
                F.substring(p, 3, 2147483647),
            )
        )

    def body(parts: Column) -> Column:
        return F.concat(
            F.element_at(parts, 1),
            F.array_join(
                F.transform(
                    F.slice(
                        parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))
                    ),
                    fix,
                ),
                "",
            ),
        )

    return _let(F.split(col, "%", -1), body)


def _let(col: Column, fn) -> Column:
    """Let-binding for Column expressions: bind ``col`` to a lambda
    variable so ``fn`` can reference it many times WITHOUT duplicating
    its whole subtree per reference (the Column API has no native let;
    every reuse of a Column object inlines a copy, and for deep chains
    like canonical_url that multiplied Catalyst analysis cost ~5×).
    ``transform`` over a one-element array is the standard trick: the
    lambda variable is a leaf, so the bound subtree appears once."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL — the key crawl pipelines dedup on
    (the same page arrives via tracking links, fragments, default
    ports, and shuffled query params): drop the fragment, lowercase
    scheme + host, strip userinfo and the scheme's default port
    (:80 http / :443 https), percent-normalize the path and query
    (r9, :func:`pct_normalize` — unreserved escapes decode, other
    escapes' hex uppercases, query '+' becomes '%20' first, so
    'q=new+york', 'q=new%20york' and stray '%7E'/'%7e' spellings
    collapse), drop tracking params (utm_*, gclid, fbclid, msclkid,
    fbid — matched AFTER normalization, so '%75tm_source' can't
    sneak through), sort the surviving query params, and strip a
    trailing slash from non-root paths. Pure JVM expressions (regex +
    split/array_sort/array_join — no Python), every pattern RE2-safe
    so a SQL oracle reproduces the chain. Host escapes are not
    normalized (percent-encoded hosts are punycode territory, out of
    scope). Non-URLs map to '' (url_host convention)."""
    col = F.col(url) if isinstance(url, str) else url

    def build(c: Column) -> Column:
        scheme = F.lower(
            F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
        )
        host = url_host(c)
        raw_port = F.regexp_extract(
            c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]+@)?[^/:?#]+:(\d+)", 1
        )

        # tail is let-bound (r9): it feeds both the path and the query
        # chains, and higher-order functions keep this Project out of
        # whole-stage codegen, so each inlined copy re-ran the strip
        # regex per row
        def with_tail(tail: Column) -> Column:
            # trailing slash off non-root paths; empty path becomes '/'
            path = pct_normalize(
                _let(
                    F.regexp_replace(
                        F.regexp_extract(tail, r"^([^?]*)", 1),
                        r"(.)/$",
                        "$1",
                    ),
                    lambda p: F.when(p == "", F.lit("/")).otherwise(p),
                )
            )
            # '+' is the form-encoded space — fold into '%20' BEFORE
            # escape normalization so both spellings share one
            # canonical form
            qnorm = pct_normalize(
                F.regexp_replace(
                    F.regexp_extract(tail, r"\?(.*)$", 1), r"\+", "%20"
                )
            )
            query = _let(
                F.array_join(
                    F.array_sort(
                        F.filter(
                            F.split(qnorm, "&"),
                            lambda p: (p != "")
                            & ~p.rlike(
                                r"^(utm_[A-Za-z0-9]+|gclid|fbclid|"
                                r"msclkid|fbid)="
                            ),
                        )
                    ),
                    "&",
                ),
                lambda q: F.when(q == "", F.lit("")).otherwise(
                    F.concat(F.lit("?"), q)
                ),
            )
            return _let(scheme, lambda sch: _let(host, lambda h: _let(
                raw_port,
                lambda rp: F.when(
                    (sch == "") | (h == ""), F.lit("")
                ).otherwise(
                    F.concat(
                        sch,
                        F.lit("://"),
                        h,
                        F.when(
                            ((sch == "http") & (rp == "80"))
                            | ((sch == "https") & (rp == "443"))
                            | (rp == ""),
                            F.lit(""),
                        ).otherwise(F.concat(F.lit(":"), rp)),
                        path,
                        query,
                    )
                ),
            )))

        return _let(
            F.regexp_replace(
                c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""
            ),
            with_tail,
        )

    return _let(F.regexp_replace(col, r"#.*$", ""), build)  # fragment off


def registrable_domain(host: Column | str) -> Column:
    """Registrable (pay-level) domain of a host — the per-SITE key the
    crawl-curation caps group on (a public-suffix-list lookup reduced
    to the high-coverage heuristic any SQL engine can reproduce): the
    last two labels, or three when the second-level label is a known
    country-code SLD (co/com/net/org/gov/ac/edu under a 2-letter TLD:
    example.co.uk → example.co.uk, www.example.com → example.com).
    '' for hosts with fewer than two labels."""
    col = F.col(host) if isinstance(host, str) else host
    three = F.regexp_extract(
        col, r"([^.]+\.(?:co|com|net|org|gov|ac|edu)\.[a-z][a-z])$", 1
    )
    two = F.regexp_extract(col, r"([^.]+\.[^.]+)$", 1)
    return F.when(three != "", three).otherwise(two)


def _parse_psl_rules(suffixes) -> tuple[frozenset, frozenset, frozenset]:
    """Parse Public Suffix List rules into (plain, wildcard-tails,
    exception-targets) frozensets. Comment ('//') and blank lines are
    skipped so a raw PSL file's lines can be passed verbatim."""
    plain, wild, exc = set(), set(), set()
    for raw in suffixes:
        s = str(raw).strip().lower()
        if not s or s.startswith("//"):
            continue
        if s.startswith("!"):
            exc.add(s[1:])
        elif s.startswith("*."):
            wild.add(s[2:])
        else:
            plain.add(s)
    return frozenset(plain), frozenset(wild), frozenset(exc)


def _psl_lookup(host: str, plain, wild, exc) -> str:
    """publicsuffix.org algorithm: among matching rules the exception
    wins outright (its public suffix is the rule minus its first
    label), else the most-labels match; wildcard '*.tail' consumes one
    extra host label; no match falls back to the default rule '*'
    (public suffix = the final label). Registrable domain = public
    suffix + one more label; '' when the host IS a public suffix."""
    if not host:
        return ""
    labels = host.split(".")
    n = len(labels)
    best = 1  # default rule '*'
    for k in range(1, n + 1):
        sfx = ".".join(labels[n - k :])
        if sfx in exc:
            best = k - 1
            break
        if sfx in plain and k > best:
            best = k
        if sfx in wild and n >= k + 1 and k + 1 > best:
            best = k + 1
    if n <= best:
        return ""
    return ".".join(labels[n - best - 1 :])


def registrable_domain_psl(host: Column | str, suffixes) -> Column:
    """Registrable domain via a real Public Suffix List lookup — the
    precision mode of :func:`registrable_domain` for multi-label
    suffixes the regex heuristic cannot know (``a.github.io`` and
    ``b.github.io`` are distinct sites; ``*.ck`` wildcards;
    ``!www.ck`` exceptions). ``suffixes`` is any iterable of PSL rule
    lines (a private-suffix subset or the full published list —
    comments and blanks are skipped).

    Scale shape: the parsed rule sets ride the UDF closure to each
    executor ONCE (the whole PSL is ~200 KB — broadcast-sized), and
    the lookup is an Arrow-batched pandas UDF doing ≤ n_labels set
    probes per host — no join, no shuffle, narrow. The regex
    heuristic stays the default because a SQL oracle can reproduce it
    verbatim; this mode trades that for PSL fidelity."""
    col = F.col(host) if isinstance(host, str) else host
    plain, wild, exc = _parse_psl_rules(suffixes)

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("string")
    def look(h: pd.Series) -> pd.Series:
        return h.map(
            lambda x: _psl_lookup((x or "").strip("."), plain, wild, exc)
        )

    return look(F.lower(col))


def html_to_text(html: Column | str) -> Column:
    """Boilerplate-stripping HTML → text, the first stage of every
    web-crawl pipeline, as pure JVM expressions (no Python): drop
    <script>/<style> elements WITH their contents, drop comments,
    strip remaining tags, decode the five core character entities
    (&amp; last, so '&amp;lt;' correctly yields the literal '&lt;'),
    and collapse whitespace. Every pattern is RE2-compatible (no
    backreferences — script/style get separate patterns), so a SQL
    oracle runs the identical chain; this is the deterministic
    high-coverage heuristic, not a browser-grade parser (CDATA and
    conditional comments pass through as text)."""
    c = F.col(html) if isinstance(html, str) else html
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))
