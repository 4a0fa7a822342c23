"""End-to-end: Spark extraction pipeline vs plain-Python goldens.

The correctness gate from BASELINE.json: per-document span-sequence
equality on (kind, text, media_ref, order) — exact, order included —
for 100% of documents.
"""

import pytest

from n8n_tools_api_spark.operators import extract_spans, salted_repartition, span_stats
from n8n_tools_api_spark.refsem import extract_document
from n8n_tools_api_spark.sources import (
    generate_documents_interleaved,
    interleaved_df,
)

N_DOCS = 150


@pytest.fixture(scope="module")
def golden():
    return {
        doc_id: extract_document(spans)
        for doc_id, spans in generate_documents_interleaved(N_DOCS)
    }


def _collect_spans(df):
    return {
        row["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in row["spans"]
        ]
        for row in df.collect()
    }


def test_span_sequence_equality(spark, golden):
    docs = interleaved_df(spark, N_DOCS, partitions=6)
    actual = _collect_spans(extract_spans(docs))
    assert set(actual) == set(golden)
    mismatches = []
    for doc_id, expected_spans in golden.items():
        exp = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in expected_spans]
        if actual[doc_id] != exp:
            mismatches.append(doc_id)
    assert mismatches == [], f"span mismatch for {len(mismatches)} docs, e.g. {mismatches[:3]}"


def test_extraction_is_narrow_no_shuffle(spark):
    docs = interleaved_df(spark, 20)
    plan = extract_spans(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"extraction stage must not shuffle:\n{plan}"


def test_boilerplate_stage_is_narrow_no_shuffle(spark):
    """Same invariant as extraction: the html-strip stage is a narrow
    mapInPandas — fat markup must never reach an exchange."""
    from n8n_tools_api_spark.operators.boilerplate import (
        strip_boilerplate_stage,
    )

    pages = spark.createDataFrame(
        [("p1", "<html><body><p>hello world text here</p></body></html>")],
        "doc_id string, html string")
    plan = strip_boilerplate_stage(pages) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"boilerplate stage must not shuffle:\n{plan}"


def test_salted_repartition_spreads_heavy_docs(spark):
    docs = interleaved_df(spark, N_DOCS)
    salted = salted_repartition(docs, 8)
    # same rows, same content — only placement changes
    assert salted.count() == N_DOCS
    out = _collect_spans(extract_spans(salted))
    base = _collect_spans(extract_spans(docs))
    assert out == base


def test_span_stats_matches_python(spark, golden):
    docs = interleaved_df(spark, N_DOCS)
    stats = {r["doc_id"]: r.asDict() for r in span_stats(extract_spans(docs)).collect()}
    for doc_id, spans in golden.items():
        s = stats[doc_id]
        assert s["n_spans"] == len(spans)
        assert s["n_text_spans"] == sum(1 for x in spans if x["kind"] == "text")
        assert s["n_image_spans"] == sum(1 for x in spans if x["kind"] == "image")
        assert s["n_media_refs"] == sum(1 for x in spans if x["media_ref"])
        assert s["text_chars"] == sum(len(x["text"]) for x in spans)
