"""Property tests: web.py URL parts vs Python's urllib on generated URLs.

urllib.parse is an independent implementation of the same RFC 3986
split — agreement over a generated URL space pins the regex parser far
beyond the oracle corpus' five shapes.
"""

from __future__ import annotations

from urllib.parse import urlsplit

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import web as W

_label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8).filter(
    lambda s: not s.startswith("-") and not s.endswith("-")
)
_host = st.lists(_label, min_size=2, max_size=4).map(".".join)
_path = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-", min_size=1, max_size=6),
    min_size=0,
    max_size=3,
).map(lambda ps: "/" + "/".join(ps) if ps else "")
_query = st.lists(
    st.tuples(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=6),
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=0, max_size=6),
    ),
    min_size=0,
    max_size=3,
).map(lambda kvs: "&".join(f"{k}={v}" for k, v in kvs))


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "ftp"]))
    host = draw(_host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_path)
    q = draw(_query)
    frag = draw(st.sampled_from(["", "#f", "#sec-2"]))
    return f"{scheme}://{host}{port}{path}" + (f"?{q}" if q else "") + frag


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(urls(), min_size=1, max_size=20))
def test_parts_match_urllib(spark, batch):
    df = spark.createDataFrame([(u,) for u in batch], "url string")
    rows = df.select(
        "url",
        W.url_scheme(F.col("url")).alias("scheme"),
        W.url_host(F.col("url")).alias("host"),
        W.url_path(F.col("url")).alias("path"),
        W.url_query(F.col("url")).alias("q"),
    ).collect()
    for r in rows:
        ref = urlsplit(r.url)
        assert r.scheme == ref.scheme
        assert r.host == (ref.hostname or "")
        assert r.path == ref.path
        assert r.q == ref.query
