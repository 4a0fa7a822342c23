"""DSIR-style hashed n-gram importance scoring (operators/dsir.py) —
semantics pins backing the ``dsir_selection`` oracle: gram accounting,
an independent pure-Python replay of the quantized weight arithmetic,
domain enrichment, and the broadcast scale shape."""

import hashlib
from collections import Counter
from math import floor

import pytest

from n8n_tools_api_spark.operators.dsir import dsir_importance


def _buckets(text, hexlen=3):
    """Pure-Python twin of hashed_gram_buckets (ASCII inputs only —
    Python str.split() and the operator's \\s+ split agree there)."""
    ws = [w for w in (text or "").lower().split() if w]
    grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return [hashlib.md5(f"dsir:{g}".encode()).hexdigest()[:hexlen]
            for g in grams]


def _ref_scores(docs, target, hexlen=3, scale=1_000_000):
    """Independent replay of the operator's weight + score arithmetic."""
    rc, tc = Counter(), Counter()
    for t in docs.values():
        rc.update(_buckets(t, hexlen))
    for t in target:
        tc.update(_buckets(t, hexlen))
    rtot = float(sum(rc.values()))
    ttot = float(max(sum(tc.values()), 1))
    w = {
        b: int(floor(((float(tc.get(b, 0)) * rtot)
                      / ((float(cr) + 1.0) * ttot) - 1.0) * float(scale)))
        for b, cr in rc.items()
    }
    return {d: sum(w.get(b, 0) for b in _buckets(t, hexlen))
            for d, t in docs.items()}


def _run(spark, docs, target):
    d = spark.createDataFrame(list(docs.items()), "doc_id string, text string")
    t = spark.createDataFrame([(x,) for x in target], "text string")
    return {r["doc_id"]: r for r in dsir_importance(d, t).collect()}


class TestGramAccounting:
    def test_unigram_plus_bigram_counts(self, spark):
        out = _run(spark, {"d3": "aa bb cc", "d1": "solo",
                           "d0": "   ", "dn": None},
                   target=["aa bb"])
        assert out["d3"]["n_grams"] == 5      # 3 unigrams + 2 bigrams
        assert out["d1"]["n_grams"] == 1      # no bigram from one word
        assert out["d0"]["n_grams"] == 0
        assert out["dn"]["n_grams"] == 0
        assert out["d0"]["score"] == 0 and out["dn"]["score"] == 0

    def test_case_and_whitespace_folded(self, spark):
        a = _run(spark, {"d": "Alpha   BETA"}, target=["alpha beta"])
        b = _run(spark, {"d": "alpha beta"}, target=["alpha beta"])
        assert a["d"]["score"] == b["d"]["score"]
        assert a["d"]["n_grams"] == 3


class TestWeightArithmetic:
    def test_matches_pure_python_replay_exactly(self, spark):
        docs = {
            "de1": "der hund und die katze und der vogel",
            "de2": "die katze der hund",
            "en1": "the cat and the dog and the bird",
            "en2": "a bird in the hand",
            "mix": "der hund and the dog",
            "nul": None,
        }
        target = ["der hund der vogel", "die katze", "und der"]
        got = {k: r["score"] for k, r in _run(spark, docs, target).items()}
        assert got == _ref_scores(docs, target)

    def test_empty_target_scores_all_zero_or_negative(self, spark):
        # ttot guard: no target grams -> every ct = 0, every weight
        # floor((0/x - 1) * 1e6) = -1e6 per raw-only gram occurrence
        out = _run(spark, {"d": "aa bb"}, target=["   "])
        assert out["d"]["score"] == -3_000_000


class TestDomainEnrichment:
    def test_target_vocab_docs_outscore_others(self, spark):
        docs = {f"a{i}": f"alpha beta gamma delta v{i}" for i in range(5)}
        docs.update({f"b{i}": f"zeta eta theta iota w{i}" for i in range(5)})
        out = _run(spark, docs, target=["alpha beta gamma delta epsilon"])
        a_scores = [out[f"a{i}"]["score"] for i in range(5)]
        b_scores = [out[f"b{i}"]["score"] for i in range(5)]
        assert min(a_scores) > max(b_scores)


class TestScaleShape:
    def test_weight_lookup_is_broadcast(self, spark):
        d = spark.createDataFrame([("d", "aa bb")], "doc_id string, text string")
        t = spark.createDataFrame([("aa",)], "text string")
        plan = dsir_importance(d, t) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan

    def test_bucket_hexlen_validation(self, spark):
        d = spark.createDataFrame([("d", "aa")], "doc_id string, text string")
        with pytest.raises(ValueError):
            dsir_importance(d, d, bucket_hexlen=0)
        with pytest.raises(ValueError):
            dsir_importance(d, d, bucket_hexlen=9)


class TestTargetFilter:
    """target_filter rides the one materialized gram pass; it must be
    row-for-row identical to passing the same slice as a target frame."""

    def test_filter_equals_slice_frame(self, spark):
        from pyspark.sql import functions as F
        rows = [("d0", "aa bb cc", "de"), ("d1", "bb cc", "en"),
                ("d2", "aa aa", "de"), ("d3", None, "en"),
                ("d4", "  ", "de")]
        d = spark.createDataFrame(rows, "doc_id string, text string, lang string")
        via_frame = sorted(map(tuple, dsir_importance(
            d, d.where(F.col("lang") == "de")).collect()))
        via_filter = sorted(map(tuple, dsir_importance(
            d, target_filter=F.col("lang") == "de").collect()))
        assert via_frame == via_filter

    def test_exactly_one_target_spec_required(self, spark):
        from pyspark.sql import functions as F
        d = spark.createDataFrame([("d", "aa", "de")],
                                  "doc_id string, text string, lang string")
        with pytest.raises(ValueError):
            dsir_importance(d)
        with pytest.raises(ValueError):
            dsir_importance(d, d, target_filter=F.col("lang") == "de")
