"""Loaders for the driver-generated testdata star schema (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_bucketed(df, name: str, key: str, n_buckets: int = 16) -> None:
    """Persist a table bucketed+sorted on its join key (SURVEY.md §4).

    Both sides of a recurring equi-join written this way join with NO
    exchange — the shuffle is paid once at write time and amortized
    over every subsequent join. The repartition guarantees ONE file
    per bucket, which additionally eliminates the sort below the join
    when ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``
    (sorted-scan ordering is opt-in since Spark 3.0). This is the
    co-located-join strategy for the engine's hot keys (orderkey,
    doc_id) at 100 TB; pinned by tests/test_bucketing.py.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a crashed previous write can leave the managed location behind
    # with no table over it — clear it through the Hadoop FS API
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{name.lower()}")
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(p):
        fs.delete(p, True)
    (
        # repartition on the key first: bucketBy alone writes one file
        # per (input partition × bucket), and multiple files per bucket
        # force a Sort under every downstream SortMergeJoin (review
        # finding) — one file per bucket makes the scan's sort order
        # satisfy the join, eliminating BOTH the exchange and the sort
        df.repartition(n_buckets, key)
        .write
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)  # managed table in the session warehouse
    )
