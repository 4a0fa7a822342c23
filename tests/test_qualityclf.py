"""NB log-odds quality classifier (operators/qualityclf.py) —
semantics pins backing the ``quality_classifier`` oracle: an
independent pure-Python integer replay of the sixteenth-bit weight
arithmetic, held-out class separation, the edge branches (wordless
docs, all-unseen vocabulary), the broadcast scale shape, and layout
invariance."""

import hashlib

import pytest

from n8n_tools_api_spark.operators.qualityclf import (
    nb_quality_weights, quality_classifier_scores)

HEXLEN = 3
B = 16 ** HEXLEN


def _buckets(text):
    ws = [w for w in (text or "").lower().split() if w]
    grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return [hashlib.md5(f"dsir:{g}".encode()).hexdigest()[:HEXLEN]
            for g in grams]


def _s16(num, den):
    """Pure-Python twin of lm_ppx.surprisal_q16 (num <= den)."""
    q = den // num
    k = q.bit_length() - 1
    return 16 * k + (den * 16) // (num * (1 << k)) - 16


def _ref(docs, pos_texts, neg_texts, threshold=0):
    """Independent replay of weights + scores with exact integers."""
    from collections import Counter
    cp, cn = Counter(), Counter()
    for t in pos_texts:
        cp.update(_buckets(t))
    for t in neg_texts:
        cn.update(_buckets(t))
    ptot, ntot = sum(cp.values()), sum(cn.values())
    wun = _s16(1, ntot + B) - _s16(1, ptot + B)

    def w(b):
        return (_s16(cn.get(b, 0) + 1, ntot + B)
                - _s16(cp.get(b, 0) + 1, ptot + B))

    out = {}
    for d, t in docs.items():
        bs = _buckets(t)
        score = sum(w(b) for b in bs)
        out[d] = (len(bs), score, score >= threshold)
    return out


def _run(spark, docs, pos, neg, **kw):
    d = spark.createDataFrame(list(docs.items()),
                              "doc_id string, text string")
    p = spark.createDataFrame([(x,) for x in pos], "text string")
    n = spark.createDataFrame([(x,) for x in neg], "text string")
    return {r["doc_id"]: (r["n_grams"], r["score_q16"], r["decision"])
            for r in quality_classifier_scores(d, p, n, **kw).collect()}


class TestWeightArithmetic:
    def test_matches_pure_python_replay_exactly(self, spark):
        docs = {
            "p1": "good clean prose with citation and reference",
            "p2": "citation reference archive",
            "n1": "spam click buy now casino",
            "n2": "click click spam banner",
            "mix": "clean prose spam click",
            "unseen": "qqz1 qqz2 qqz3",
            "mt": "",
            "nul": None,
        }
        pos = ["good clean prose citation reference",
               "archive citation verified reference"]
        neg = ["spam click casino banner", "buy now click spam"]
        assert _run(spark, docs, pos, neg) == _ref(docs, pos, neg)

    def test_matches_replay_on_seeded_random_corpus(self, spark):
        """One Spark job over 200 seeded-random docs vs the pure-Python
        replay — the fuzz-shaped pin (ASCII corpus: the replay twin's
        str.split agrees with the operator's \\s+ split there)."""
        import random

        rng = random.Random(271828)
        vocab = [f"w{i}" for i in range(60)] + ["good", "bad", "spam",
                                                "citation", "promo"]
        mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))
        docs = {f"d{i}": mk(rng.randrange(0, 40)) for i in range(200)}
        docs["dnull"] = None
        pos = [mk(30) + " citation good" for _ in range(6)]
        neg = [mk(30) + " spam promo" for _ in range(6)]
        assert _run(spark, docs, pos, neg) == _ref(docs, pos, neg)

    def test_wordless_docs_score_zero(self, spark):
        out = _run(spark, {"mt": "", "nul": None, "ws": "   "},
                   ["aa bb"], ["cc dd"])
        for d in ("mt", "nul", "ws"):
            assert out[d] == (0, 0, True)  # 0 >= default threshold 0

    def test_all_unseen_doc_scores_n_grams_times_baseline(self, spark):
        # asymmetric class masses make w_unseen nonzero — the mass gap
        # must exceed the mantissa quantization step (2^k/16 = 256
        # grams at den ~4096), so the negative slice carries 279 grams
        # vs 3: the score of a doc sharing no trained bucket must be
        # exactly n_grams * wun
        pos = ["aa bb"]
        neg = [" ".join(f"x{i}" for i in range(140))]
        ptot, ntot = 3, 279  # unigrams + bigrams per slice
        wun = _s16(1, ntot + B) - _s16(1, ptot + B)
        assert wun != 0
        out = _run(spark, {"u": "zq1 zq2 zq3"}, pos, neg)
        assert out["u"] == (5, 5 * wun, 5 * wun >= 0)

    def test_threshold_is_honored(self, spark):
        docs = {"p": "aa bb", "n": "cc dd"}
        lo = _run(spark, docs, ["aa bb"], ["cc dd"], threshold_q16=-10**9)
        hi = _run(spark, docs, ["aa bb"], ["cc dd"], threshold_q16=10**9)
        assert lo["p"][2] and lo["n"][2]
        assert not hi["p"][2] and not hi["n"][2]


class TestHeldOutSeparation:
    def test_transfer_to_unseen_docs_of_each_class(self, spark):
        # train and held-out docs share marker vocabulary but no rows —
        # the signal must transfer, not be memorized
        noise = ["table row batch key", "scan filter merge sort",
                 "query window group value", "join hash part line"]
        mk_p = lambda i: f"{noise[i % 4]} citation reference archive v{i}"
        mk_n = lambda i: f"{noise[(i + 1) % 4]} spam click banner w{i}"
        pos = [mk_p(i) for i in range(0, 8, 2)]
        neg = [mk_n(i) for i in range(0, 8, 2)]
        held = {f"hp{i}": mk_p(i) for i in range(1, 8, 2)}
        held.update({f"hn{i}": mk_n(i) for i in range(1, 8, 2)})
        out = _run(spark, held, pos, neg)
        for d in held:
            if d.startswith("hp"):
                assert out[d][1] > 0 and out[d][2], (d, out[d])
            else:
                assert out[d][1] < 0 and not out[d][2], (d, out[d])


class TestScaleShape:
    def test_weight_lookup_is_broadcast(self, spark):
        d = spark.createDataFrame([("d", "aa bb")],
                                  "doc_id string, text string")
        p = spark.createDataFrame([("aa",)], "text string")
        n = spark.createDataFrame([("bb",)], "text string")
        plan = quality_classifier_scores(d, p, n) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan

    def test_weight_table_is_bounded_and_adjusted(self, spark):
        p = spark.createDataFrame([("aa bb cc",)], "text string")
        n = spark.createDataFrame([("aa dd",)], "text string")
        weights, baseline = nb_quality_weights(p, n)
        rows = weights.collect()
        assert 0 < len(rows) <= 2 * B
        assert all(r["w_adj_q16"] != 0 for r in rows)
        assert len(baseline.collect()) == 1

    def test_bucket_hexlen_validation(self, spark):
        d = spark.createDataFrame([("d", "aa")], "doc_id string, text string")
        with pytest.raises(ValueError):
            quality_classifier_scores(d, d, d, bucket_hexlen=0)
        with pytest.raises(ValueError):
            quality_classifier_scores(d, d, d, bucket_hexlen=9)


class TestComposedClassifierCuration:
    def test_dedup_then_classify_stage_order(self, spark):
        """DCLM/FineWeb-Edu order (curation.py::
        classifier_curation_keep_list): dedup first, classifier scores
        only surviving canonicals — duplicates carry NULL scores."""
        from n8n_tools_api_spark.operators.curation import (
            classifier_curation_keep_list)

        docs = spark.createDataFrame([
            ("a1", "unique prose about tables and rows citation verified"),
            ("a2", "unique prose about tables and rows citation verified"),
            ("b1", "spam click banner lottery jackpot promo offer now"),
            ("c1", "completely different text on scans and filters"
                   " citation verified reference"),
        ], "doc_id string, text string")
        pos = spark.createDataFrame(
            [("good clean citation verified reference",)], "text string")
        neg = spark.createDataFrame(
            [("spam click banner lottery jackpot promo",)], "text string")
        out = {r["doc_id"]: r for r in
               classifier_curation_keep_list(docs, pos, neg).collect()}
        # a2 is an exact dup of a1: dedup status, never scored
        assert out["a2"]["status"] == "exact_dup"
        assert out["a2"]["canonical"] == "a1"
        assert out["a2"]["score_q16"] is None
        # a1/c1 carry positive markers -> kept with positive scores
        for d in ("a1", "c1"):
            assert out[d]["status"] == "kept" and out[d]["score_q16"] > 0
            assert out[d]["canonical"] == d
        # b1 is pure negative-class vocabulary -> rejected, NULL canon
        assert out["b1"]["status"] == "rejected_classifier"
        assert out["b1"]["score_q16"] < 0
        assert out["b1"]["canonical"] is None


class TestLayoutInvariance:
    def test_partitioning_does_not_change_scores(self, spark):
        docs = {f"d{i}": f"word{i % 7} citation word{i % 5} spam w{i}"
                for i in range(40)}
        d = spark.createDataFrame(list(docs.items()),
                                  "doc_id string, text string")
        p = spark.createDataFrame([("citation reference",)], "text string")
        n = spark.createDataFrame([("spam click",)], "text string")
        a = sorted(map(tuple, quality_classifier_scores(
            d.repartition(1), p, n).collect()))
        b = sorted(map(tuple, quality_classifier_scores(
            d.repartition(7), p.repartition(2), n).collect()))
        assert a == b
