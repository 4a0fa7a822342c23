"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction over sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 plus the
training-data-pipeline operators (dedup / similarity / text analysis /
multimodal plumbing).
``oracle_sql()`` — DuckDB-equivalent SQL for each SQL-expressible query
(rows-only checks for the pandas-UDF / multi-stage-hash operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full extraction pipeline over sf0.001 documents
    (wrapped as interleaved docs) → per-document span statistics."""
    from n8n_tools_api_spark.plans import all_queries

    return all_queries()["extract_documents_stats"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from n8n_tools_api_spark.plans import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from n8n_tools_api_spark.plans import all_oracles

    return all_oracles()
