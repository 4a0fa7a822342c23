"""CCNet-style LM-perplexity bucketing (operators/lm_ppx.py) —
semantics pins backing the ``lm_perplexity_buckets`` oracle: an
independent pure-Python replay of the sixteenth-bit surprisal
arithmetic, bigram/edge accounting, the unseen-group constant, the
per-group equal-thirds split, and the broadcast scale shape."""

import hashlib

import pytest

from pyspark.sql import functions as F

from n8n_tools_api_spark.operators.lm_ppx import ccnet_buckets, lm_perplexity

V = 4096  # 16^3 vocabulary buckets at the default hexlen


def _bk(w, hexlen=3):
    return hashlib.md5(f"ppx:{w}".encode()).hexdigest()[:hexlen]


def _s16(num, den):
    """Pure-Python twin of surprisal_q16 — integer-only."""
    q = den // num
    e = q.bit_length() - 1
    return 16 * e + (den * 16) // (num * (1 << e)) - 16


def _ref(docs, train_ids, hexlen=3):
    """Independent replay of the per-group add-one bigram LM scoring.

    docs: {doc_id: (grp, text)} → {doc_id: (n_bigrams, total, mean)}
    """
    def bigrams(text):
        ws = [w for w in (text or "").lower().split() if w]
        return [( _bk(a, hexlen), _bk(b, hexlen))
                for a, b in zip(ws, ws[1:])]

    cb, cc = {}, {}
    for d in train_ids:
        grp, text = docs[d]
        for b1, b2 in bigrams(text):
            cb[(grp, b1, b2)] = cb.get((grp, b1, b2), 0) + 1
            cc[(grp, b1)] = cc.get((grp, b1), 0) + 1
    out = {}
    for d, (grp, text) in docs.items():
        bs = bigrams(text)
        tot = sum(_s16(cb.get((grp, b1, b2), 0) + 1,
                       cc.get((grp, b1), 0) + 16 ** hexlen)
                  for b1, b2 in bs)
        out[d] = (len(bs), tot, tot // len(bs) if bs else None)
    return out


def _run(spark, docs, train_ids):
    d = spark.createDataFrame(
        [(k, grp, text) for k, (grp, text) in docs.items()],
        "doc_id string, lang string, text string")
    rep = lm_perplexity(d, F.col("doc_id").isin(list(train_ids)))
    return {r["doc_id"]: r for r in rep.collect()}


class TestSurprisalArithmetic:
    def test_matches_pure_python_replay_exactly(self, spark):
        docs = {
            "t1": ("en", "the cat sat on the mat near the cat"),
            "t2": ("en", "the dog sat on the rug"),
            "s1": ("en", "the cat sat on the mat"),
            "s2": ("en", "a zebra jumped over seven moons"),
            "g1": ("de", "der hund und die katze"),
            "g2": ("de", "die katze und der hund schlafen"),
        }
        train = {"t1", "t2", "g1"}
        got = _run(spark, docs, train)
        ref = _ref(docs, train)
        for d, (n, tot, mean) in ref.items():
            assert got[d]["n_bigrams"] == n, d
            assert got[d]["surprisal_q16"] == tot, d
            assert got[d]["ppx_q16"] == mean, d

    def test_training_doc_scores_below_novel_doc(self, spark):
        docs = {
            "seen": ("en", "alpha beta gamma delta alpha beta"),
            "novel": ("en", "omicron sigma upsilon phi chi psi"),
        }
        got = _run(spark, docs, {"seen"})
        assert got["seen"]["ppx_q16"] < got["novel"]["ppx_q16"]

    def test_unseen_group_costs_log2_v_per_bigram(self, spark):
        # no training rows for the group → num=1, den=V → every bigram
        # costs exactly 16*log2(4096) = 192 sixteenth-bits
        docs = {"x": ("xx", "five words of novel language here")}
        got = _run(spark, docs, set())
        assert got["x"]["n_bigrams"] == 5
        assert got["x"]["surprisal_q16"] == 5 * 192
        assert got["x"]["ppx_q16"] == 192


class TestEdgeAccounting:
    def test_bigramless_docs_total_zero_mean_null(self, spark):
        docs = {"one": ("en", "solitary"), "mt": ("en", "   "),
                "nul": ("en", None), "two": ("en", "two words")}
        got = _run(spark, docs, {"two"})
        for d in ("one", "mt", "nul"):
            assert got[d]["n_bigrams"] == 0
            assert got[d]["surprisal_q16"] == 0
            assert got[d]["ppx_q16"] is None
        assert got["two"]["n_bigrams"] == 1

    def test_null_group_keys_on_empty_string(self, spark):
        d = spark.createDataFrame(
            [("a", None, "x y z"), ("b", "", "x y z")],
            "doc_id string, lang string, text string")
        rows = {r["doc_id"]: r for r in
                lm_perplexity(d, F.lit(True)).collect()}
        assert rows["a"]["grp"] == "" == rows["b"]["grp"]
        assert rows["a"]["ppx_q16"] == rows["b"]["ppx_q16"]


class TestBuckets:
    def test_equal_thirds_per_group_with_remainder_first(self, spark):
        # 7 en docs with distinct ppx → tiles 3/2/2; 1 de doc → all head
        docs = {f"e{i}": ("en", " ".join(f"w{i}x{j}" for j in range(6)))
                for i in range(7)}
        docs["d0"] = ("de", "ein wort noch")
        d = spark.createDataFrame(
            [(k, grp, text) for k, (grp, text) in docs.items()],
            "doc_id string, lang string, text string")
        out = ccnet_buckets(lm_perplexity(d, F.col("doc_id") == "e0"))
        rows = out.collect()
        en = [r for r in rows if r["grp"] == "en"]
        assert sorted(r["bucket"] for r in en) == \
            ["head"] * 3 + ["middle"] * 2 + ["tail"] * 2
        de = [r for r in rows if r["grp"] == "de"]
        assert [r["bucket"] for r in de] == ["head"]

    def test_head_is_least_surprising(self, spark):
        docs = {f"e{i}": ("en", f"common words {'common words ' * i}end")
                for i in range(1, 7)}
        d = spark.createDataFrame(
            [(k, grp, text) for k, (grp, text) in docs.items()],
            "doc_id string, lang string, text string")
        rows = ccnet_buckets(
            lm_perplexity(d, F.col("doc_id") == "e6")).collect()
        by_bucket = {}
        for r in rows:
            by_bucket.setdefault(r["bucket"], []).append(r["ppx_q16"])
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])

    def test_bigramless_docs_get_none_bucket(self, spark):
        d = spark.createDataFrame(
            [("a", "en", "two words"), ("b", "en", "solo")],
            "doc_id string, lang string, text string")
        rows = {r["doc_id"]: r for r in
                ccnet_buckets(lm_perplexity(d, F.lit(True))).collect()}
        assert rows["b"]["bucket"] == "none" and rows["b"]["tile"] is None
        assert rows["a"]["bucket"] == "head" and rows["a"]["tile"] == 1


class TestScaleShape:
    def test_count_lookups_are_broadcast(self, spark):
        d = spark.createDataFrame([("d", "en", "aa bb cc")],
                                  "doc_id string, lang string, text string")
        plan = lm_perplexity(d, F.lit(True)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan

    def test_bucket_hexlen_validation(self, spark):
        d = spark.createDataFrame([("d", "en", "aa bb")],
                                  "doc_id string, lang string, text string")
        with pytest.raises(ValueError):
            lm_perplexity(d, F.lit(True), bucket_hexlen=0)
        with pytest.raises(ValueError):
            lm_perplexity(d, F.lit(True), bucket_hexlen=5)


class TestCcnetKeepList:
    def _corpus(self, spark):
        rows = [("u1", "123 456 789"),          # coverage<=0.5 -> unknown
                ("u2", None), ("u3", "   "),    # blank -> unknown
                ("w1", "solitary")]             # english, bigram-less
        rows += [(f"e{i}", " ".join(f"word{i}x{j}" for j in range(8)))
                 for i in range(7)]             # 7 english docs
        rows += [("g1", "der hund schläft überall gemütlich größer")]
        return spark.createDataFrame(rows, "doc_id string, text string")

    def test_disposition_ladder(self, spark):
        from n8n_tools_api_spark.operators.lm_ppx import ccnet_keep_list

        out = {r["doc_id"]: r for r in
               ccnet_keep_list(self._corpus(spark)).collect()}
        assert len(out) == 12  # one disposition per input page
        for d in ("u1", "u2", "u3"):
            r = out[d]
            assert r["status"] == "rejected_lang"
            assert r["detected"] == "unknown"
            assert r["n_bigrams"] is None and r["bucket"] is None
        assert out["w1"]["status"] == "rejected_empty"
        assert out["w1"]["detected"] == "english"
        assert out["g1"]["detected"] == "german"
        en = [out[f"e{i}"] for i in range(7)]
        assert sorted(r["bucket"] for r in en) == \
            ["head"] * 3 + ["middle"] * 2 + ["tail"] * 2
        for r in en:
            if r["bucket"] == "head":
                assert r["status"] == "kept_head"
            elif r["bucket"] == "middle":
                assert r["status"] == "kept_middle"
            else:
                key = hashlib.md5(f"314159:{r['doc_id']}".encode()) \
                    .hexdigest()[:8]
                want = ("kept_tail_sampled" if key < "19999999"
                        else "rejected_tail")
                assert r["status"] == want, r["doc_id"]

    def test_detector_gates_before_lm(self, spark):
        # unknown pages must not influence any language's LM: adding
        # them leaves every other page's ppx unchanged
        from n8n_tools_api_spark.operators.lm_ppx import ccnet_keep_list

        base = self._corpus(spark)
        known_only = base.where(~F.col("doc_id").startswith("u"))
        a = {r["doc_id"]: r["ppx_q16"]
             for r in ccnet_keep_list(base).collect()
             if not r["doc_id"].startswith("u")}
        b = {r["doc_id"]: r["ppx_q16"]
             for r in ccnet_keep_list(known_only).collect()}
        assert a == b
