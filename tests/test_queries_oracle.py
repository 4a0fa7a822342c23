"""Mirror of the driver's correctness gate: every oracle-backed query is
run through Spark AND DuckDB at sf0.001 and compared exactly (sorted
columns, sorted rows, exact values) — the same comparison the driver
does at sf0.01, so failures show up here first.
"""

import duckdb
import pandas as pd
import pytest

from n8n_tools_api_spark.plans import ORACLE_QUERIES, PIPELINE_QUERIES
from n8n_tools_api_spark.sources.tables import TABLES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("datetime", "object")):
            df[c] = df[c].map(lambda v: None if v is None or v != v else str(v))
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(ORACLE_QUERIES))
def test_oracle_parity(spark, sf_dir, duck, name):
    fn, sql = ORACLE_QUERIES[name]
    spark_pd = _normalize(fn(spark, sf_dir).toPandas())
    duck_pd = _normalize(duck.execute(sql).fetchdf())
    assert list(spark_pd.columns) == list(duck_pd.columns), "column names differ"
    assert len(spark_pd) == len(duck_pd), "row counts differ"
    pd.testing.assert_frame_equal(spark_pd, duck_pd, check_dtype=False,
                                  check_exact=True)


@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES))
def test_pipeline_queries_run(spark, sf_dir, name):
    df = PIPELINE_QUERIES[name](spark, sf_dir)
    rows = df.limit(5000).collect()
    assert df.schema is not None
    # every rows-only query on this corpus is expected to be non-empty
    assert len(rows) > 0, f"{name} returned no rows"


# queries whose CONSTRUCTION legitimately runs Spark jobs: everything
# that reaches the components fixpoint (one convergence .collect() per
# round) or the k-means/recall loops. Measured with the fixed classic-
# DataFrame patch by emptying this set and recording the failures —
# minhash_near_dups and ann_kmeans_refined_counts turned out NOT to be
# eager and are now guarded.
_EAGER_BY_DESIGN = {"near_dup_clusters", "curation_pipeline",
                    "ann_recall_evidence", "stream_curation",
                    "web_pipeline_lsh", "semdedup_status_counts"}


@pytest.mark.parametrize(
    "name", sorted(set(PIPELINE_QUERIES) - _EAGER_BY_DESIGN))
def test_query_construction_runs_no_driver_action(spark, sf_dir, name,
                                                  monkeypatch):
    """Building a query plan must not trigger driver actions (round-2
    verdict #5: embedding_near_dup_pairs sniffed the vector dim with
    `.first()`, one extra driver job per query).

    Patches the CLASSIC DataFrame (the concrete runtime class on a
    non-Connect session), not the abstract ``pyspark.sql.DataFrame``
    parent: on PySpark 4 the classic subclass overrides every action,
    so a patch on the parent is dead code and the guard can never fire
    (round-5 review finding — verified by planting a .collect())."""
    from pyspark.sql.classic.dataframe import DataFrame

    def _boom(self, *a, **k):
        raise AssertionError(f"driver action during {name} plan construction")

    for action in ("first", "head", "collect", "count", "take", "toPandas"):
        monkeypatch.setattr(DataFrame, action, _boom)
    PIPELINE_QUERIES[name](spark, sf_dir)  # construction only, no execute
