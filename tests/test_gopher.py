"""Gopher repetition filters (Rae et al. 2021, Appendix A1.1) —
hand-computed fractions + gate behavior. The full DuckDB replay is the
gopher_repetition oracle (test_queries_oracle.py)."""

from n8n_tools_api_spark.operators.textstats import gopher_repetition


def _rows(spark, docs):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    return {r["doc_id"]: r for r in gopher_repetition(df).collect()}


class TestGopherRepetition:
    def test_hand_computed_fractions(self, spark):
        out = _rows(spark, [
            # 'aaa bbb' twice + unique line: 1 beyond-first occurrence
            # out of 3 lines; 7 of 21 line-chars duplicated
            ("dup", "aaa bbb\naaa bbb\nccc ddd"),
            # no repetition at all
            ("clean", "one two three four five six"),
        ])
        d = out["dup"]
        assert d["n_lines"] == 3
        assert d["dup_line_frac"] == round(1 / 3, 6)
        assert d["dup_line_char_frac"] == round(7 / 21, 6)
        c = out["clean"]
        assert c["dup_line_frac"] == 0.0 and c["gopher_keep"] is True
        # grams occurring once are not repetition: short clean docs
        # score 0, not len(gram)/len(doc) (which would misfire the gate)
        assert c["top2gram_char_frac"] == 0.0
        # the dup doc's repeated 2-gram: 'aaa bbb' twice = 14/23 chars
        assert d["top2gram_char_frac"] == round(14 / 23, 6)

    def test_gates_fire_on_planted_pathologies(self, spark):
        line = "the same line again"
        out = _rows(spark, [
            ("rep", "\n".join([line] * 5) + "\nunique tail"),
            ("gram", "spam ham " * 40 + "end"),
            ("ok", "a perfectly normal sentence with varied words here"),
        ])
        assert out["rep"]["dup_line_frac"] == round(4 / 6, 6)
        assert out["rep"]["gopher_keep"] is False
        assert out["gram"]["top2gram_char_frac"] > 0.5
        assert out["gram"]["gopher_keep"] is False
        assert out["ok"]["gopher_keep"] is True

    def test_null_and_blank_docs_are_safe(self, spark):
        out = _rows(spark, [("n", None), ("b", "   \n  \n"), ("t", "x")])
        for k in ("n", "b"):
            r = out[k]
            assert r["n_lines"] == 0 and r["gopher_keep"] is True
            assert r["dup_line_frac"] == 0.0
        assert out["t"]["n_lines"] == 1 and out["t"]["gopher_keep"] is True
