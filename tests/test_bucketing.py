"""Co-located bucketed joins (SURVEY.md §4 scale strategy): the shuffle
is paid once at write time; every subsequent join on the bucket key
runs with zero Exchange and zero Sort."""

from pyspark.sql import functions as F


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, sf_dir, tmp_path_factory):
        from n8n_tools_api_spark.sources.tables import write_bucketed

        # multi-partition inputs: without the repartition inside
        # write_bucketed this produces several files per bucket and a
        # Sort under the join (the regression the test pins)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(4)
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(4)
        write_bucketed(orders, "orders_b", "o_orderkey", 8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_b", "o_orderkey", 8)

        # disable broadcast so the (tiny) test tables take the same
        # sort-merge path a 100-TB fact-fact join takes — the point is
        # the bucket layout satisfying the join's distribution
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # sorted-scan ordering is opt-in since Spark 3.0 and only valid
        # with one file per bucket (which write_bucketed guarantees via
        # its repartition)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        try:
            joined = (
                spark.table("lineitem_b")
                .join(spark.table("orders_b"), "o_orderkey")
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"))
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # the join inputs must come straight from the bucketed scans:
            # no Exchange below the SortMergeJoin (the groupBy above it
            # still exchanges, as it must)
            assert "SortMergeJoin" in plan, plan[:1500]
            join_part = plan.split("SortMergeJoin", 1)[1]
            assert "Exchange" not in join_part, join_part[:2000]
            # one sorted file per bucket (repartition-then-bucketBy) —
            # the scan satisfies the join's ordering too, no re-sort
            assert "Sort " not in join_part, join_part[:2000]
            got = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.conf.set(
                "spark.sql.legacy.bucketedTableScan.outputOrdering", "false")

        # correctness: identical to the unbucketed join
        expected = (
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
            .join(orders, "o_orderkey")
            .groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        )
        exp = {r["o_orderpriority"]: r["n"] for r in expected.collect()}
        assert got == exp
