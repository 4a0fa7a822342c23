"""canonical_url / url_dedup edge semantics (operators/curation.py).

The url_canonical_dedup oracle replays the planted family shapes; these
tests pin the rules the planted corpus doesn't reach: non-default port
on a non-http scheme, bare host with no path, empty query string, a
``?`` with only tracking params, and the identity fallback for junk.
"""

import pytest
from pyspark.sql import functions as F

from n8n_tools_api_spark.operators.curation import canonical_url, url_dedup

CASES = [
    # (raw, canonical)
    ("https://Example.COM:443/a/b/?utm_source=x&b=2&a=1#f",
     "https://example.com/a/b?a=1&b=2"),
    ("http://www.Example.com:80", "http://example.com"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com/x?", "https://example.com/x"),
    ("https://example.com/x?utm_a=1&fbclid=2", "https://example.com/x"),
    ("https://example.com/x?ref=1&refresh=2",  # 'refresh' is NOT 'ref'
     "https://example.com/x?refresh=2"),
    ("ftp://Example.com:21/f", "ftp://example.com:21/f"),  # no default strip
    ("https://example.com:8443/f", "https://example.com:8443/f"),
    ("https://u:pw@HOST.com/P/Q", "https://host.com/P/Q"),  # path case kept
    ("no scheme here", "no scheme here"),
    ("", ""),
    (None, ""),
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "id int, url string"
    ).select("id", canonical_url(F.col("url")).alias("c")).orderBy("id")
    got = [r.c for r in df.collect()]
    assert got == [want for _, want in CASES]


def test_url_dedup_disposition(spark):
    rows = [
        ("a", "https://example.com/x?b=2&a=1"),
        ("b", "https://WWW.example.com/x/?a=1&b=2#frag"),
        ("c", "https://example.com/y"),
        ("d", None),
        ("e", None),
    ]
    out = {r.doc_id: r for r in url_dedup(
        spark.createDataFrame(rows, "doc_id string, url string")).collect()}
    assert out["a"].status == "kept" and out["a"].group_size == 2
    assert out["b"].status == "url_dup" and out["b"].first_doc == "a"
    assert out["c"].status == "kept" and out["c"].group_size == 1
    # NULL pseudo-group: both collapse on canonical ''
    assert out["d"].status == "kept" and out["d"].canonical_url == ""
    assert out["e"].status == "url_dup" and out["e"].group_size == 2


def test_url_dedup_single_slim_exchange(spark):
    """The only exchange is the window over canonical_url — the
    canonicalization itself rides the scan (no shuffle before it)."""
    df = url_dedup(spark.createDataFrame(
        [("a", "https://example.com/x")], "doc_id string, url string"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


@pytest.mark.parametrize("raw", ["https://example.com/x?b=2&a=1",
                                 "not a url", None])
def test_canonical_idempotent(spark, raw):
    df = spark.createDataFrame([(raw,)], "url string").select(
        canonical_url(F.col("url")).alias("c1"))
    df2 = df.select("c1", canonical_url(F.col("c1")).alias("c2"))
    r = df2.collect()[0]
    assert r.c1 == r.c2


def test_url_key_sentinel_cannot_collide_with_junk_url(spark):
    """Ingest exemption keys live in a namespace disjoint from real
    canonicals (round-5 review finding): a junk url field spelled like
    a NULL-URL document's sentinel must NOT share its dedup key — both
    rows survive the ingest prefilter."""
    from n8n_tools_api_spark.streaming.dedup_stream import (
        url_dedup_stream_batch_twin)

    rows = [
        ("42", "2024-06-01 12:00:00", None),          # sentinel: n:42
        ("junk", "2024-06-01 12:00:01", "n:42"),      # identity junk
        ("junk2", "2024-06-01 12:00:02", "__nourl__:42"),  # old spelling
    ]
    df = spark.createDataFrame(rows, "doc_id string, ts string, url string") \
        .select("doc_id", F.to_timestamp("ts").alias("event_time"), "url")
    kept = sorted(r.doc_id for r in
                  url_dedup_stream_batch_twin(df).collect())
    assert kept == ["42", "junk", "junk2"]
