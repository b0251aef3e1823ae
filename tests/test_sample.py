"""Deterministic stratified sampling (corpus mixing)."""

import pytest

from vearch_spark.operators.sample import hash_bucket, hash_sample, rate_threshold


def test_rate_threshold_bounds():
    assert rate_threshold(0.0) == 0
    assert rate_threshold(1.0) == 1 << 32
    assert rate_threshold(0.25) == 1 << 30


def test_hash_sample_deterministic_and_stratified(spark):
    rows = [(i, f"s{i % 2}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = hash_sample(df, {"s0": 0.3, "s1": 0.9}, stratum_col="source")
    got1 = sorted(r.doc_id for r in out.collect())
    # same result on a different partitioning — RNG-free
    got2 = sorted(
        r.doc_id
        for r in hash_sample(
            df.repartition(7), {"s0": 0.3, "s1": 0.9}, stratum_col="source"
        ).collect()
    )
    assert got1 == got2
    by_src = {
        s: sum(1 for i in got1 if i % 2 == int(s[1]))
        for s in ("s0", "s1")
    }
    assert 0.2 < by_src["s0"] / 1000 < 0.4
    assert 0.8 < by_src["s1"] / 1000 < 1.0
    # unknown stratum keeps default_rate=1.0
    extra = spark.createDataFrame([(99999, "sX")], "doc_id long, source string")
    assert hash_sample(extra, {"s0": 0.3}).count() == 1


def test_hash_split_partitions_every_row_once(spark):
    from vearch_spark.operators.sample import hash_split

    df = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert sum(counts.values()) == 5000
    assert 0.75 < counts["train"] / 5000 < 0.85
    assert 0.05 < counts["val"] / 5000 < 0.15
    # deterministic: same assignment under different partitioning
    again = {r.doc_id: r.split for r in hash_split(
        df.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    first = {r.doc_id: r.split for r in out.collect()}
    assert first == again


def test_cluster_balanced_sample(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from vearch_spark.operators.ivf import CLUSTER_COL
    from vearch_spark.operators.sample import cluster_balanced_sample

    # two well-separated clusters, 20 points each
    rng = np.random.default_rng(0)
    rows = []
    for i in range(40):
        center = [0.0, 0.0] if i < 20 else [10.0, 10.0]
        v = (np.array(center) + rng.normal(0, 0.1, 2)).tolist()
        rows.append((i, v))
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    cents = np.array([[0.0, 0.0], [10.0, 10.0]])

    out = cluster_balanced_sample(df, cents, id_col="doc_id", per_cluster=3)
    got = out.select("doc_id", CLUSTER_COL).collect()
    by_cluster: dict[int, set] = {}
    for r in got:
        by_cluster.setdefault(r[CLUSTER_COL], set()).add(r.doc_id)
    # exact quota per cluster, assignment respected
    assert {len(v) for v in by_cluster.values()} == {3}
    assert all(d < 20 for d in by_cluster[0]) and all(d >= 20 for d in by_cluster[1])

    # deterministic and layout-independent: same kept set after a
    # repartition (the md5 rank is a pure function of the id)
    again = cluster_balanced_sample(
        df.repartition(7), cents, id_col="doc_id", per_cluster=3
    )
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in got}


def test_temperature_rates_math():
    from vearch_spark.operators.sample import temperature_rates

    counts = {"big": 8000, "small": 1000, "tiny": 125}
    # alpha=1 → natural proportions: every source keeps target_fraction
    r1 = temperature_rates(counts, alpha=1.0, target_fraction=0.5)
    assert all(abs(v - 0.5) < 1e-12 for v in r1.values())
    # alpha=0 → uniform across sources: equal doc budgets per source,
    # capped at 1.0 for sources smaller than the budget
    r0 = temperature_rates(counts, alpha=0.0, target_fraction=0.5)
    budget = 0.5 * sum(counts.values()) / 3  # ≈1520.8 docs per source
    # sources smaller than the uniform budget cap at 1.0 (fully kept)
    assert r0["tiny"] == 1.0 and r0["small"] == 1.0
    assert abs(r0["big"] * 8000 - budget) < 1e-6
    # intermediate alpha boosts the tail relative to natural: the keep
    # rate goes ∝ n^(alpha-1), strictly decreasing in source size until
    # the 1.0 cap bites (tiny caps here)
    rmid = temperature_rates(counts, alpha=0.5, target_fraction=0.3)
    assert rmid["tiny"] == 1.0
    assert 1.0 > rmid["small"] > rmid["big"]
    with pytest.raises(ValueError):
        temperature_rates(counts, alpha=-0.1)


def test_temperature_mix_sample_deterministic(spark):
    from pyspark.sql import functions as F

    from vearch_spark.operators.sample import temperature_mix_sample

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 2400, "web").otherwise("wiki").alias("source"),
    )
    kept = temperature_mix_sample(df, alpha=0.3, target_fraction=0.5)
    counts = {r.source: r["cnt"] for r in
              kept.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    # flattening: wiki (tail) keeps a larger fraction than web
    assert counts["wiki"] / 600 > counts["web"] / 2400
    # layout-independent: identical kept set after repartition
    again = temperature_mix_sample(df.repartition(13), alpha=0.3, target_fraction=0.5)
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in kept.collect()}


def test_embedding_outliers_flags_planted_noise(spark):
    """A point far from every cluster gets a large positive z in its
    assigned cluster; inliers don't. Scores are layout-independent."""
    import numpy as np

    from vearch_spark.operators.sample import embedding_outliers

    rng = np.random.default_rng(0)
    centers = rng.normal(0, 10, (4, 8))
    x = centers[rng.integers(0, 4, 400)] + rng.normal(0, 0.5, (400, 8))
    x[0] = centers[0] + 25.0  # planted outlier
    df = spark.createDataFrame(
        [(int(i), x[i].tolist()) for i in range(400)],
        "doc_id long, embedding array<float>",
    )
    out = embedding_outliers(df, centers, vec_col="embedding",
                             id_col="doc_id", z_threshold=3.0)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].is_outlier == 1 and rows[0].z > 3.0
    assert sum(r.is_outlier for r in rows.values()) < 20  # not everything
    # layout-independent: same result after a repartition
    out2 = embedding_outliers(df.repartition(13), centers, vec_col="embedding",
                              id_col="doc_id", z_threshold=3.0)
    assert {(r.doc_id, r.z) for r in out2.collect()} == {
        (r.doc_id, r.z) for r in rows.values()
    }


def test_temperature_mix_handles_null_stratum(spark):
    """A NULL source is its own stratum (rides default_rate) — it used
    to crash the whole mixing job in sorted()/create_map."""
    from vearch_spark.operators.sample import temperature_mix_sample

    rows = [(f"d{i}", "web") for i in range(40)] + [
        (f"n{i}", None) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = temperature_mix_sample(df, alpha=1.0, target_fraction=0.5)
    got = out.collect()
    assert 0 < len(got) < 80
    # both strata participate proportionally (alpha=1 → natural mix)
    assert any(r.source is None for r in got) and any(r.source == "web" for r in got)


def test_outliers_preassigned_cluster_col_parity(spark, embeddings):
    """cluster_col (the index's persisted assignment) must reproduce
    the recompute path exactly — same cells, same z-scores."""
    from pyspark.sql import functions as F

    from vearch_spark.operators.ivf import CLUSTER_COL
    from vearch_spark.operators.ivf_oracle import float_centroids
    from vearch_spark.operators.knn_join import probe_cells_udf
    from vearch_spark.operators.sample import embedding_outliers

    cents = float_centroids("/root/testdata/sf0.001")
    pre = embeddings.withColumn(
        CLUSTER_COL,
        F.element_at(
            probe_cells_udf(cents, 1)(F.col("embedding").cast("array<double>")), 1
        ),
    )
    a = sorted(map(tuple, embedding_outliers(
        embeddings, cents, id_col="vec_id", z_threshold=2.0).collect()))
    b = sorted(map(tuple, embedding_outliers(
        pre, cents, id_col="vec_id", z_threshold=2.0,
        cluster_col=CLUSTER_COL).collect()))
    assert a == b


def test_shuffle_shards_deterministic_export(spark, tmp_path):
    """shuffle_shards/write_shards: shard+pos are pure (seed, id)
    functions — two writes produce byte-identical shard orders, every
    id appears exactly once, shard files come back sorted by pos, and
    a different seed is a genuine reshuffle."""
    from vearch_spark.operators.sample import shuffle_shards, write_shards

    docs = spark.range(300).withColumnRenamed("id", "doc_id").repartition(7)
    out = shuffle_shards(docs, 4, seed=1)
    rows = out.collect()
    assert len(rows) == 300
    assert {r.doc_id for r in rows} == set(range(300))
    assert {r.shard for r in rows} <= set(range(4))
    per = {}
    for r in rows:
        per.setdefault(r.shard, []).append(r.pos)
    for shard, ps in per.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))  # dense ranks

    again = {(r.doc_id, r.shard, r.pos) for r in shuffle_shards(
        docs.repartition(3), 4, seed=1).collect()}
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}  # layout-proof
    reshuf = {(r.doc_id, r.shard, r.pos) for r in shuffle_shards(
        docs, 4, seed=2).collect()}
    assert reshuf != again  # a new seed is a real reshuffle

    p = str(tmp_path / "shards")
    write_shards(docs, p, 4, seed=1)
    back = spark.read.parquet(p + "/shard=2").collect()
    want = sorted(
        [(r.doc_id, r.pos) for r in rows if r.shard == 2], key=lambda t: t[1]
    )
    assert [(r.doc_id, r.pos) for r in sorted(back, key=lambda r: r.pos)] == want
    import pytest as _pytest

    with _pytest.raises(ValueError):
        shuffle_shards(docs, 0)


def test_url_host_and_registrable_domain(spark):
    """Host extraction strips scheme/userinfo/port/path exactly;
    registrable-domain groups ccSLD hosts at three labels and
    everything else at two; non-URLs map to ''."""
    from pyspark.sql import functions as F

    from vearch_spark.functions.text import registrable_domain, url_host

    cases = [
        ("https://www.Example.COM/a/b?q=1#f", "www.example.com", "example.com"),
        ("http://user:pw@blog.shop.co.uk:8443/x", "blog.shop.co.uk", "shop.co.uk"),
        ("ftp://cdn.site9.io", "cdn.site9.io", "site9.io"),
        ("https://a.b.c.example.org", "a.b.c.example.org", "example.org"),
        ("https://something.gov.br/page", "something.gov.br", "something.gov.br"),
        ("not a url at all", "", ""),
        ("https://localhost/x", "localhost", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    got = (
        df.withColumn("host", url_host("url"))
        .withColumn("domain", registrable_domain(F.col("host")))
        .collect()
    )
    for (u, want_h, want_d), r in zip(cases, got):
        assert r.host == want_h, u
        assert r.domain == want_d, u


def test_registrable_domain_psl_algorithm(spark):
    """PSL-mode lookup implements the publicsuffix.org algorithm on a
    rule subset: multi-label private suffixes (a.github.io and
    b.github.io are distinct registrable domains), wildcard rules
    ('*.ck' — any single label is a public suffix under ck), exception
    rules ('!www.ck' — www.ck is registrable despite the wildcard),
    longest match wins, unknown TLDs fall back to the default rule,
    and a bare public suffix maps to ''. Comment/blank PSL lines are
    skipped so raw file lines pass verbatim."""
    from pyspark.sql import functions as F

    from vearch_spark.functions.text import registrable_domain_psl

    rules = [
        "// ===BEGIN ICANN DOMAINS===",
        "",
        "com", "io", "uk", "co.uk", "*.ck", "!www.ck",
        "github.io", "k12.ma.us", "us",
    ]
    cases = [
        ("a.github.io", "a.github.io"),       # private multi-label suffix
        ("x.a.github.io", "a.github.io"),
        ("github.io", ""),                    # the suffix itself
        ("www.example.com", "example.com"),
        ("blog.shop.co.uk", "shop.co.uk"),    # longest match beats 'uk'
        ("b.test.ck", "b.test.ck"),           # wildcard: test.ck is a PS
        ("test.ck", ""),
        ("www.ck", "www.ck"),                 # exception beats wildcard
        ("a.www.ck", "www.ck"),
        ("school.k12.ma.us", "school.k12.ma.us"),
        ("host.unknowntld", "host.unknowntld"),  # default rule '*'
        ("localhost", ""),
        ("", ""),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = df.withColumn(
        "domain", registrable_domain_psl(F.col("host"), rules)
    ).collect()
    for (h, want), r in zip(cases, got):
        assert r.domain == want, h


def test_domain_cap_psl_mode_caps_platform_subdomains(spark):
    """With public_suffixes given, domain_cap groups on the PSL key:
    a.github.io and b.github.io fill their caps INDEPENDENTLY, where
    the default regex heuristic lumps all of github.io into one
    domain and under-caps the platform."""
    from vearch_spark.operators.sample import domain_cap

    rows = [
        (i, f"https://{'ab'[i % 2]}.github.io/p/{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept_psl = domain_cap(
        df, cap=5, seed=1, public_suffixes=["github.io", "io", "com"]
    ).collect()
    per = {}
    for r in kept_psl:
        per[r.domain] = per.get(r.domain, 0) + 1
    assert per == {"a.github.io": 5, "b.github.io": 5}
    # heuristic default: one shared 'github.io' domain, single cap
    kept_rx = domain_cap(df, cap=5, seed=1).collect()
    assert {r.domain for r in kept_rx} == {"github.io"}
    assert len(kept_rx) == 5


def test_domain_cap_deterministic_and_bounded(spark):
    """domain_cap keeps ≤ cap docs per registrable domain, the kept
    set is a pure function of (seed, id) — identical across
    repartitionings — and different seeds pick different winners."""
    from pyspark.sql import functions as F

    from vearch_spark.operators.sample import domain_cap

    rows = [
        (i, f"https://w{i % 3}.site{i % 4}.{'co.uk' if i % 2 else 'com'}/p/{i}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = domain_cap(df, cap=5, seed=1).collect()
    per = {}
    for r in kept:
        per[r.domain] = per.get(r.domain, 0) + 1
    assert per and all(v <= 5 for v in per.values())
    # every domain with ≥5 candidates is filled to exactly 5
    cand = {}
    for i in range(200):
        d = f"site{i % 4}." + ("co.uk" if i % 2 else "com")
        cand[d] = cand.get(d, 0) + 1
    for d, n in cand.items():
        assert per.get(d, 0) == min(5, n), d
    # layout-independence
    kept2 = domain_cap(df.repartition(13), cap=5, seed=1).collect()
    assert {r.doc_id for r in kept2} == {r.doc_id for r in kept}
    # seed sensitivity
    kept3 = domain_cap(df, cap=5, seed=2).collect()
    assert {r.doc_id for r in kept3} != {r.doc_id for r in kept}
    with pytest.raises(ValueError, match="cap"):
        domain_cap(df, cap=0)


def test_canonical_url(spark):
    """URL canonicalization: fragment dropped, scheme+host lowercased,
    userinfo and default ports stripped (non-default kept), tracking
    params removed, surviving params sorted, trailing slash stripped
    from non-root paths; non-URLs map to ''."""
    from pyspark.sql import functions as F

    from vearch_spark.functions.text import canonical_url

    cases = [
        ("HTTPS://User:pw@Example.COM:443/a/b/?b=2&utm_source=x&a=1#frag",
         "https://example.com/a/b?a=1&b=2"),
        ("http://site.org:80/", "http://site.org/"),
        ("http://site.org:8080/p?gclid=abc&z=9&fbclid=t",
         "http://site.org:8080/p?z=9"),
        ("https://a.io", "https://a.io/"),
        ("https://a.io/x?utm_campaign=only", "https://a.io/x"),
        ("https://a.io/x?", "https://a.io/x"),
        ("ftp://Host.Net/Dir/", "ftp://host.net/Dir"),
        ("not a url", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = df.withColumn("canon", canonical_url("url")).collect()
    for (u, want), r in zip(cases, got):
        assert r.canon == want, u
    # same page through different tracking links → one canonical key
    variants = [
        "https://example.com/page?a=1&b=2",
        "https://EXAMPLE.com:443/page/?b=2&a=1#top",
        "https://u@example.com/page?utm_medium=social&a=1&b=2",
    ]
    df2 = spark.createDataFrame([(u,) for u in variants], "url string")
    canon = {r.canon for r in df2.withColumn("canon", canonical_url("url")).collect()}
    assert canon == {"https://example.com/page?a=1&b=2"}


def test_canonical_url_percent_normalization(spark):
    """r9 percent-encoding normalization: unreserved escapes decode
    ('%61' → 'a', '%7E'/'%7e' → '~'), other escapes' hex uppercases
    ('%2f' → '%2F'), query '+' folds into '%20', malformed escapes
    pass through, and a percent-spelled tracking param ('%75tm_…')
    still gets dropped."""
    from vearch_spark.functions.text import canonical_url, pct_normalize

    cases = [
        # unreserved decode in path and query
        ("https://a.io/%61rticles/5?a=%31", "https://a.io/articles/5?a=1"),
        # tilde both hex cases; reserved %2f uppercased, NOT decoded
        ("https://a.io/p%7Eq%7e?x=%2fv", "https://a.io/p~q~?x=%2Fv"),
        # '+' in query = %20; '+' in path is literal and untouched
        ("https://a.io/a+b?q=new+york", "https://a.io/a+b?q=new%20york"),
        ("https://a.io/a+b?q=new%20york", "https://a.io/a+b?q=new%20york"),
        # malformed escapes survive verbatim
        ("https://a.io/p?bad=%zz&t=%2", "https://a.io/p?bad=%zz&t=%2"),
        # escape-spelled tracking param is dropped after normalization
        ("https://a.io/p?%75tm_source=x&a=1", "https://a.io/p?a=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = df.withColumn("canon", canonical_url("url")).collect()
    for (u, want), r in zip(cases, got):
        assert r.canon == want, u
    # the normalizer alone: idempotent, '%' edge cases
    df2 = spark.createDataFrame(
        [("%41%2c%", ), ("no escapes",), ("",)], "s string"
    )
    got2 = [r.n for r in df2.select(pct_normalize("s").alias("n")).collect()]
    assert got2 == ["A%2C%", "no escapes", ""]
