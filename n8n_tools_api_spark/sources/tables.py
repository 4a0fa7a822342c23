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


# (rows, row_groups) per path — footer metadata is immutable testdata,
# so one driver-side read per path per process is enough
_LAYOUT_CACHE: dict[str, tuple[int, int]] = {}


def _parquet_layout(path: str) -> tuple[int, int]:
    """Total (rows, row_groups) of a parquet file or directory."""
    if path in _LAYOUT_CACHE:
        return _LAYOUT_CACHE[path]
    import glob
    import os

    import pyarrow.parquet as pq

    files = [path] if os.path.isfile(path) else sorted(
        glob.glob(os.path.join(path, "*.parquet")))
    rows = groups = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        rows += md.num_rows
        groups += md.num_row_groups
    _LAYOUT_CACHE[path] = (rows, max(groups, 1))
    return _LAYOUT_CACHE[path]


def read_sf_table(spark: SparkSession, sf_dir: str, name: str,
                  rescue: bool | str = True) -> DataFrame:
    """Read an sf table, rescuing scan parallelism from unsplittable
    input layouts (guide §2.5 "input skew": one huge single-row-group
    file serializes every downstream narrow operator onto one core —
    parquet's split granularity is the ROW GROUP, so maxPartitionBytes
    cannot help).

    The driver-generated tables are written as ONE row group per ~1M
    rows (sf1.0 documents = 50k rows = 1 row group → every per-doc
    regex/shingle/signature map ran single-threaded, measured 10-18 s
    per query at sf1.0). When the footer says the file provides fewer
    splits than the session's cores AND the rows-per-split are large
    enough that post-scan work dominates, repartition by the table's
    key column (hash — deterministic, no sort, unlike round-robin).
    Results are layout-invariant (COVERAGE.md cross-layout sweep);
    only placement changes. On a production corpus (many ~row-group
    sized files) the condition never fires and the read stays plain.
    """
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if not rescue:
        # bounded-fixture consumers (oracle chains that immediately
        # slice to a few hundred planted rows) opt out: the keyed
        # repartition would fan their tiny slice into cores-sized
        # exchanges whose empty tasks dominate the chain's wall time
        # (guide §1.2 — scheduling overhead, measured: the web/C4
        # pipeline oracles ran ~30% faster without the rescue while
        # full-table per-row-heavy queries ran 2-9x faster WITH it)
        return df
    # rescue="force" extends the rescue to relational tables for
    # callers whose downstream is CPU-dense per input row (rollup
    # grouping-set decimal sums, fat sort-merge map sides). Plain
    # scan+aggregate queries measured a net LOSS from it (the exchange
    # costs more than the parallelism buys), so it is opt-in per query,
    # never the default.
    if rescue != "force" and name not in ("documents", "embeddings"):
        # relational tables feed scan+aggregate/join queries where
        # map-side partial aggregation already shrinks the data before
        # any exchange — an up-front repartition measured as a net LOSS
        # there (events_daily 0.4 s -> 1.4 s, q1 0.5 s -> 0.9 s at
        # sf1.0). Only the text/vector tables, whose consumers do
        # heavy per-row work (regex/shingle/gram/cosine), benefit.
        return df
    try:
        rows, groups = _parquet_layout(path)
    except Exception:
        return df  # exotic layout: fall back to the plain read
    if rescue == "force" and rows < 1_000_000:
        # scale gate for the relational force path: the exchange's
        # fixed cost (~0.2-0.3 s) only amortizes once the serialized
        # per-row compute exceeds it — measured crossover between 600k
        # rows (q10 at sf0.1: force LOSES 0.26 s) and 1.5M rows
        # (rollup at sf1.0: force WINS 1.5 s). Text/vector rescues are
        # unaffected: their per-row work is heavy at any size.
        return df
    cores = spark.sparkContext.defaultParallelism
    if groups < cores and rows // groups >= 1500:
        n = min(cores * 2, max(rows // 1000, cores))
        df = df.repartition(n, df[df.columns[0]])
    return df


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
