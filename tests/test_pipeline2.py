"""Unit tests for the batch-2 pipeline operators (web / lm / audit /
triangle counting / sequence pairs) — edge cases the oracle corpus
doesn't construct."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import audit as AU
from prosnet_prefect_pipelines_spark.operators import lm as LM
from prosnet_prefect_pipelines_spark.operators import web as W
from prosnet_prefect_pipelines_spark.operators.graph import triangle_count
from prosnet_prefect_pipelines_spark.operators.temporal import context_target_pairs


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(W.canonicalize_url(F.col("url")).alias("c")).collect()]


def test_canonicalize_url_rules(spark):
    got = _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/Path/",          # case+www+port+slash
            "http://a.b.org:8080/x/",                     # non-default port kept
            "https://user:pw@Host.net:80",                # creds + :80 + empty path
            "https://site.io/?utm_source=a&utm_medium=b", # tracking-only query
            "https://site.io/p?a=1&utm_x=2&b=3&fbclid=z", # mixed query, order kept
            "not a url",                                  # -> NULL
            "https://site.io",                            # bare host -> root path
        ],
    )
    assert got == [
        "https://example.com/Path",
        "http://a.b.org:8080/x",
        "https://host.net/",
        "https://site.io/",
        "https://site.io/p?a=1&b=3",
        None,
        "https://site.io/",
    ]


def test_url_parts_and_domain(spark):
    df = spark.createDataFrame(
        [("https://User@a.b.Example.org:8443/x?q=1#f",), ("nope",)], "url string"
    )
    host = W.url_host(F.col("url"))
    rows = df.select(
        host.alias("host"),
        W.url_scheme(F.col("url")).alias("scheme"),
        W.url_path(F.col("url")).alias("path"),
        W.registered_domain(host).alias("dom"),
    ).collect()
    assert rows[0].host == "a.b.example.org"
    assert rows[0].scheme == "https"
    assert rows[0].path == "/x"
    assert rows[0].dom == "example.org"
    assert rows[1].host is None and rows[1].scheme is None


def test_triangle_count_known_graphs(spark):
    # K4 has 4 triangles; reversed duplicates and self-loops must not count
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a != b]  # both directions
    edges = spark.createDataFrame(k4 + [("a", "a")], "src string, dst string")
    assert triangle_count(edges).collect()[0].triangles == 4
    # a 4-cycle has none
    square = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], "src string, dst string"
    )
    assert triangle_count(square).collect()[0].triangles == 0


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(2, "y"), (3, "zz"), (4, "w")], "k long, v string"
    )
    got = {
        r.k: r.status
        for r in AU.snapshot_diff(old, new, ["k"], ["v"], include_same=True).collect()
    }
    assert got == {1: "removed", 2: "same", 3: "changed", 4: "added"}
    # default drops 'same'
    assert {
        r.k for r in AU.snapshot_diff(old, new, ["k"], ["v"]).collect()
    } == {1, 3, 4}


def test_checksum_order_independent_and_null_safe(spark):
    rows = [(1, "a", "g"), (2, None, "g"), (3, "null", "g")]
    df = spark.createDataFrame(rows, "id long, t string, g string")
    c1 = AU.content_checksum(df, ["g"], ["id", "t"]).collect()[0]
    shuffled = spark.createDataFrame(list(reversed(rows)), "id long, t string, g string")
    c2 = AU.content_checksum(shuffled.repartition(7), ["g"], ["id", "t"]).collect()[0]
    assert c1.checksum == c2.checksum and c1.n_rows == 3
    # NULL and the string 'null' fingerprint differently
    a = AU.content_checksum(
        spark.createDataFrame([(1, None)], "id long, t string"), [], ["t"]
    ).collect()[0]
    b = AU.content_checksum(
        spark.createDataFrame([(1, "null")], "id long, t string"), [], ["t"]
    ).collect()[0]
    assert a.checksum != b.checksum


def test_context_target_pairs_short_and_ordered(spark):
    df = spark.createDataFrame(
        [(1, i, f"t{i}") for i in range(5)] + [(2, 0, "a"), (2, 1, "b")],
        "user long, pos long, tok string",
    )
    got = context_target_pairs(df, "user", ["pos"], "tok", n_context=3).collect()
    # user 2 is too short for any pair; user 1 yields positions 3 and 4
    assert sorted((r.key, r.context, r.target) for r in got) == [
        (1, "t0 t1 t2", "t3"),
        (1, "t1 t2 t3", "t4"),
    ]


def test_corpus_freq_score_manual(spark):
    # corpus: 'a' appears 3x, 'b' 2x, 'z' 1x
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b z")], "id long, text string"
    )
    got = {r.id: r for r in LM.corpus_freq_score(df, "id", "text", rare_threshold=1).collect()}
    # doc 1 tokens (a,a,b): freqs (3,3,2) -> mean 8/3, no rare
    assert got[1].mean_token_freq_micro == 2666666
    assert got[1].rare_frac_micro == 0
    # doc 2 tokens (a,b,z): freqs (3,2,1) -> mean 2, 1/3 rare
    assert got[2].mean_token_freq_micro == 2000000
    assert got[2].rare_frac_micro == 333333


def test_vocab_coverage_monotone(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c")], "id long, text string"
    )
    rows = LM.vocab_coverage(df, "text", top_k=2).collect()
    assert [r.token for r in rows] == ["a", "b"]
    assert [r.cum_share_micro for r in rows] == [500000, 833333]


def test_linear_quality_features(spark):
    df = spark.createDataFrame(
        [("hi hi 12 999 wonderful",), ("",)], "text string"
    )
    feats = LM.linear_quality_features(F.col("text"))
    rows = df.select(*[c.alias(n) for n, c in feats.items()]).collect()
    r = rows[0]
    assert r.n_tokens == 5 and r.n_long_tokens == 1
    assert r.n_digit_tokens == 2 and r.n_repeat_tokens == 1
