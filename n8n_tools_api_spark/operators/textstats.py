"""Text-analysis operators over a documents table (doc_id, text, ...).

Two tiers:

* JVM-side column expressions for everything regex-count-shaped
  (token counts, ratio scoring) — these live in plans/catalog.py with
  DuckDB oracles;
* pandas-UDF stages for the reference-exact Python-regex behaviors
  (language detection A6, confidence mining A7, text cleaning F1) —
  this module, rows-only checked, semantics pinned by refsem tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

LANG_SCHEMA = (
    "doc_id bigint, lang string, detected string, confidence double"
)

CLEAN_SCHEMA = "doc_id bigint, clean_text string, clean_chars int"


def _lang_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import math

    from n8n_tools_api_spark.refsem import detect_primary_language

    for pdf in batches:
        det, conf = [], []
        for text in pdf["text"]:
            res = detect_primary_language(text or "")
            det.append(res["detected"])
            # floor-truncate to 6 decimals, NOT Python round: floor is
            # reproducible in DuckDB (the doc_language_scores oracle),
            # banker's rounding is not
            conf.append(math.floor(float(res["confidence"]) * 1e6) / 1e6)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"], "lang": pdf["lang"],
            "detected": det, "confidence": conf,
        })


def detect_language(docs: DataFrame) -> DataFrame:
    """Reference language detector (A6) over a documents table.

    Narrow map (no shuffle); Arrow-batched; Python `re` semantics
    exactly match ocr_response_formatter.py:667-713 via refsem.
    """
    return docs.select("doc_id", "lang", "text").mapInPandas(
        _lang_batches, schema=LANG_SCHEMA
    )


def _clean_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from n8n_tools_api_spark.refsem import clean_extracted_text

    for pdf in batches:
        cleaned = [clean_extracted_text(t or "") for t in pdf["text"]]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "clean_text": cleaned,
            "clean_chars": [len(c) for c in cleaned],
        })


def clean_text(docs: DataFrame) -> DataFrame:
    """F1 text cleaning (ocr_response_formatter.py:148-173) as a stage."""
    return docs.select("doc_id", "text").mapInPandas(
        _clean_batches, schema=CLEAN_SCHEMA
    )
