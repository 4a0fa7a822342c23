"""PII redaction (operators/pii.py) and per-host capping
(operators/curation.py::per_host_cap) — semantics pins backing the
``pii_redaction`` / ``host_cap_keep_list`` oracles."""

import pytest
from pyspark.sql import functions as F

from n8n_tools_api_spark.operators.curation import canonical_host, per_host_cap
from n8n_tools_api_spark.operators.pii import (
    EMAIL_TOKEN, IP_TOKEN, PHONE_TOKEN, redact_pii,
)


def _redact(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return {r["doc_id"]: r for r in redact_pii(df).collect()}


class TestRedactPii:
    def test_each_kind_masked_with_its_token(self, spark):
        out = _redact(spark, [
            ("e", "write to bob.smith+tag@sub.example.co.uk today"),
            ("p1", "call (555) 123-4567 now"),
            ("p2", "or 555.123.4567 works"),
            ("p3", "or 555-123-4567 too"),
            ("i", "ping 10.0.255.1 first"),
        ])
        assert out["e"]["redacted_text"] == f"write to {EMAIL_TOKEN} today"
        assert (out["e"]["n_emails"], out["e"]["pii_total"]) == (1, 1)
        for k in ("p1", "p2", "p3"):
            assert PHONE_TOKEN in out[k]["redacted_text"]
            assert out[k]["n_phones"] == 1
        assert out["i"]["redacted_text"] == f"ping {IP_TOKEN} first"
        assert out["i"]["has_pii"] is True

    def test_sequential_order_email_digits_not_double_counted(self, spark):
        # the phone-shaped digit run lives INSIDE the email local part;
        # the email stage masks it first, so the phone count stays 0
        out = _redact(spark, [("d", "mail 123.456.7890@mail.test please")])
        d = out["d"]
        assert d["redacted_text"] == f"mail {EMAIL_TOKEN} please"
        assert (d["n_emails"], d["n_phones"], d["n_ips"]) == (1, 0, 0)

    def test_mixed_line_counts_every_kind(self, spark):
        out = _redact(spark, [
            ("m", "a@b.io and (555) 867-5309 from 192.168.1.1 twice 192.168.1.2"),
        ])
        m = out["m"]
        assert (m["n_emails"], m["n_phones"], m["n_ips"]) == (1, 1, 2)
        assert m["pii_total"] == 4
        assert m["redacted_text"].count(IP_TOKEN) == 2

    def test_null_and_clean_text(self, spark):
        out = _redact(spark, [
            ("n", None),
            ("c", "no personal data in this sentence"),
        ])
        assert out["n"]["redacted_text"] == "" and out["n"]["pii_total"] == 0
        assert out["n"]["has_pii"] is False
        assert out["c"]["redacted_text"] == "no personal data in this sentence"

    def test_permissive_ip_and_non_matches_pinned(self, spark):
        out = _redact(spark, [
            ("big", "octets 999.999.999.999 match by design (Dolma-permissive)"),
            ("ver", "version 1.2.3 stays"),
            ("run", "digits 5551234567 without separators stay"),
        ])
        assert out["big"]["n_ips"] == 1
        assert out["ver"]["pii_total"] == 0
        assert out["run"]["pii_total"] == 0

    def test_pure_projection_no_exchange(self, spark):
        df = spark.createDataFrame(
            [("a", "x@y.zz")], "doc_id string, text string")
        plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


URLS = "doc_id string, url string, q bigint"


class TestPerHostCap:
    def test_canonicalization(self, spark):
        df = spark.createDataFrame([
            ("a", "https://www.Example.COM:8080/x", 1),
            ("b", "HTTP://EXAMPLE.com/y", 1),
            ("c", "not a url", 1),
            ("d", None, 1),
        ], URLS)
        hosts = {r["doc_id"]: r["h"] for r in df.select(
            "doc_id", canonical_host(F.col("url")).alias("h")).collect()}
        assert hosts["a"] == "example.com" == hosts["b"]
        assert hosts["c"] == "" == hosts["d"]

    def test_cap_keeps_best_quality_with_id_tiebreak(self, spark):
        rows = [(f"d{i}", "https://one.test/p", 10 - (i % 3)) for i in range(9)]
        rows += [("z", "https://two.test/p", 1)]
        kept = per_host_cap(
            spark.createDataFrame(rows, URLS), cap=4, quality_col="q")
        got = sorted((r["doc_id"], r["host_rank"]) for r in kept.collect()
                     if r["host"] == "one.test")
        # quality 10: d0,d3,d6 (id asc), then quality 9: d1 first
        assert got == [("d0", 1), ("d1", 4), ("d3", 2), ("d6", 3)]
        assert kept.where(F.col("host") == "two.test").count() == 1

    def test_salted_two_phase_is_lossless(self, spark):
        rows = [(f"d{i:03d}", f"https://h{i % 5}.test/x", (i * 37) % 11)
                for i in range(200)]
        df = spark.createDataFrame(rows, URLS)
        one = sorted(map(tuple, per_host_cap(
            df, cap=6, quality_col="q", salt_buckets=1).collect()))
        many = sorted(map(tuple, per_host_cap(
            df.repartition(7), cap=6, quality_col="q",
            salt_buckets=16).collect()))
        assert one == many
        assert len(one) == 30  # 5 hosts x cap 6

    def test_no_quality_col_orders_by_id(self, spark):
        df = spark.createDataFrame(
            [(f"d{i}", "https://h.test/x", 0) for i in range(5)], URLS)
        kept = {r["doc_id"]: r["host_rank"]
                for r in per_host_cap(df, cap=2).collect()}
        assert kept == {"d0": 1, "d1": 2}

    def test_cap_must_be_positive(self, spark):
        df = spark.createDataFrame([("a", "https://h.test/x", 1)], URLS)
        with pytest.raises(ValueError):
            per_host_cap(df, cap=0)
