"""Per-partition lineage + idempotent resume (north_rule requirement).

The reference's correlation-id structured logs (app/core/logging.py:
223-281,364-371) become a lineage/metrics table; its retry/circuit-
breaker machinery (error_recovery.py:141-330) becomes Spark task retry
plus THIS commit protocol for whole-job restartability:

* input is bucketed by ``pmod(xxhash64(doc_id), n_buckets)`` — content-
  derived, so every rerun sees identical buckets regardless of cluster
  size or input layout;
* buckets are processed in groups; each group is written with dynamic
  partition overwrite (only the touched ``bucket=N`` directories are
  replaced), then a lineage row ``(run_id, bucket, doc_count,
  span_count, media_ref_count, wall_ms)`` is committed;
* on restart, buckets already present in the lineage table for this
  ``run_id`` are skipped; a group whose data write succeeded but whose
  lineage append failed is simply re-written — byte-identical output
  (the pipeline is deterministic), so the protocol is idempotent, not
  merely at-least-once.

Every read/write goes through sources/iceberg_ddl.py helpers, which
dispatch per deployment: on a cluster with the catalog attached, the
data write is an atomic ``overwritePartitions()`` and the lineage
commit a single ``MERGE INTO``; on the local parquet warehouse the
same call-sites use dynamic partition overwrite and parquet-file
atomicity (each append is one new file).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.iceberg_ddl import (
    clear_run_outputs,
    commit_lineage,
    overwrite_extracted_buckets,
    read_extracted_data,
    read_lineage,
)
from .extract import extract_spans


def _with_bucket(docs: DataFrame, n_buckets: int) -> DataFrame:
    return docs.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )


def committed_buckets(spark: SparkSession, lineage_path: str, run_id: str) -> set[int]:
    try:
        rows = (
            read_lineage(spark, lineage_path)
            .where(F.col("run_id") == run_id)
            .select("bucket").distinct().collect()
        )
    except Exception:
        return set()
    return {r["bucket"] for r in rows}


def resumable_extract(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    run_id: str,
    n_buckets: int = 16,
    group_size: int = 4,
    fail_after_groups: int | None = None,
) -> dict:
    """Run the extraction pipeline with per-bucket-group commits.

    ``fail_after_groups`` is a test hook: raise after N committed groups
    to simulate a mid-job crash; a rerun with the same run_id resumes.
    Returns {"processed_buckets": [...], "skipped_buckets": [...]}.
    """
    data_path = f"{out_dir}/data"
    lineage_path = f"{out_dir}/_lineage"
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    bucketed = _with_bucket(docs, n_buckets)
    done = committed_buckets(spark, lineage_path, run_id)
    # out_dir holds ONE active run. Starting a fresh run_id over a
    # reused out_dir clears BOTH the data and the old lineage: dynamic
    # overwrite only replaces partitions THIS run writes, so an empty
    # bucket would otherwise expose the previous run's documents through
    # read_extracted — and keeping the old run's lineage while deleting
    # its data would let a later "resume" of that run_id return success
    # over someone else's output (review findings). Mid-run resume
    # (done non-empty) must NOT clear. Deletion goes through the Hadoop
    # FileSystem API so s3a/hdfs paths behave like local ones.
    if not done:
        clear_run_outputs(spark, data_path, lineage_path, run_id)
    todo = [b for b in range(n_buckets) if b not in done]
    groups = [todo[i:i + group_size] for i in range(0, len(todo), group_size)]

    processed: list[int] = []
    for gi, group in enumerate(groups):
        if fail_after_groups is not None and gi >= fail_after_groups:
            raise RuntimeError(f"simulated crash before group {gi}")
        t0 = time.perf_counter()
        subset = bucketed.where(F.col("bucket").isin(group))
        extracted = extract_spans(subset.drop("bucket"))
        # re-derive the bucket on the output (doc_id is stable) so the
        # fat spans column never carries an extra shuffle; persist so the
        # stats pass below reuses the write's computation instead of
        # running the extraction UDF a second time. Stats intentionally
        # come from `out`, NOT a read-back of data_path: a read-back
        # crashes on empty groups and attributes stale bucket dirs from
        # a previous run_id to this run's lineage.
        out = _with_bucket(extracted, n_buckets).persist()
        try:
            overwrite_extracted_buckets(spark, out, data_path)
            # amortized per bucket so lineage_metrics' sum reflects the
            # run's true wall time (review finding: stamping the full
            # group wall on every bucket overcounted by group_size x)
            wall_ms = int((time.perf_counter() - t0) * 1000 / max(len(group), 1))
            agg = (
                out.groupBy("bucket")
                .agg(
                    F.count("*").alias("doc_count"),
                    F.sum(F.size("spans")).alias("span_count"),
                    F.sum(
                        F.size(F.filter("spans", lambda s: s["media_ref"] != F.lit("")))
                    ).alias("media_ref_count"),
                )
            )
            # explicit zero rows for buckets with no documents, so empty
            # buckets COMMIT and resume skips them too
            group_df = spark.createDataFrame([(b,) for b in group], "bucket int")
            stats = (
                group_df.join(agg, "bucket", "left")
                .select(
                    F.lit(run_id).alias("run_id"), "bucket",
                    F.coalesce("doc_count", F.lit(0)).cast("bigint").alias("doc_count"),
                    F.coalesce("span_count", F.lit(0)).cast("bigint").alias("span_count"),
                    F.coalesce("media_ref_count", F.lit(0)).cast("bigint")
                    .alias("media_ref_count"),
                    F.lit(wall_ms).cast("bigint").alias("wall_ms"),
                )
            )
            commit_lineage(spark, stats, lineage_path)
        finally:
            out.unpersist()
        processed.extend(group)
    return {"processed_buckets": processed, "skipped_buckets": sorted(done)}


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    return read_extracted_data(spark, f"{out_dir}/data").drop("bucket")


def lineage_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """The A9-analog error/health rollup over the lineage table
    (error_metrics.py:178-258 re-expressed as a groupBy)."""
    lin = read_lineage(spark, f"{out_dir}/_lineage")
    return (
        lin.groupBy("run_id")
        .agg(
            F.countDistinct("bucket").alias("buckets_committed"),
            F.sum("doc_count").alias("docs"),
            F.sum("span_count").alias("spans"),
            F.sum("media_ref_count").alias("media_refs"),
            F.sum("wall_ms").alias("total_wall_ms"),
        )
    )
