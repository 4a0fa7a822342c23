"""Streaming exact dedup (ingest-time A10 twin) vs its batch twin."""

import datetime


def _run_stream(spark, in_dir, out_dir, ckpt_dir, watermark="10 minutes"):
    from n8n_tools_api_spark.streaming import dedup_stream

    schema = "doc_id string, event_time timestamp, text string"
    stream = spark.readStream.schema(schema).parquet(str(in_dir))
    q = (
        dedup_stream(stream, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


class TestDedupStream:
    def test_duplicates_within_watermark_are_dropped(self, spark, tmp_path):
        base = datetime.datetime(2024, 6, 1, 12, 0, 0)
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        rows = [
            ("a", base, "the quick brown fox"),
            ("a_dup", base + datetime.timedelta(minutes=1), "the quick brown fox"),
            ("b", base + datetime.timedelta(minutes=2), "a different document"),
            ("b_dup", base + datetime.timedelta(minutes=3), "a different document"),
            ("c", base + datetime.timedelta(minutes=4), "unique third text"),
        ]
        spark.createDataFrame(
            rows, "doc_id string, event_time timestamp, text string"
        ).write.mode("append").parquet(str(in_dir))
        _run_stream(spark, in_dir, tmp_path / "out", tmp_path / "ckpt")
        out = spark.read.parquet(str(tmp_path / "out")).collect()
        # one survivor per content hash; exactly 3 distinct texts
        assert len(out) == 3
        assert {r["text"] for r in out} == {r[2] for r in rows}

    def test_incremental_drain_suppresses_cross_batch_dups(self, spark, tmp_path):
        base = datetime.datetime(2024, 6, 1, 12, 0, 0)
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        schema = "doc_id string, event_time timestamp, text string"
        spark.createDataFrame(
            [("a", base, "same bytes")], schema
        ).write.mode("append").parquet(str(in_dir))
        _run_stream(spark, in_dir, tmp_path / "out", tmp_path / "ckpt",
                    watermark="2 hours")
        # second landing: a duplicate within the watermark horizon plus
        # one genuinely new doc — only the new doc may pass
        spark.createDataFrame(
            [("a_retry", base + datetime.timedelta(minutes=30), "same bytes"),
             ("b", base + datetime.timedelta(minutes=31), "new content")],
            schema).write.mode("append").parquet(str(in_dir))
        _run_stream(spark, in_dir, tmp_path / "out", tmp_path / "ckpt",
                    watermark="2 hours")
        out = spark.read.parquet(str(tmp_path / "out")).collect()
        assert sorted(r["doc_id"] for r in out) == ["a", "b"]

    def test_null_text_docs_are_exempt(self, spark, tmp_path):
        """Media-only (NULL-text) docs must ALL survive the prefilter —
        a NULL content hash must never act as a shared dedup key."""
        base = datetime.datetime(2024, 6, 1, 12, 0, 0)
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        rows = [
            ("media_1", base, None),
            ("media_2", base + datetime.timedelta(minutes=1), None),
            ("t", base + datetime.timedelta(minutes=2), "real text"),
            ("t_dup", base + datetime.timedelta(minutes=3), "real text"),
        ]
        spark.createDataFrame(
            rows, "doc_id string, event_time timestamp, text string"
        ).write.mode("append").parquet(str(in_dir))
        _run_stream(spark, in_dir, tmp_path / "out", tmp_path / "ckpt")
        out = spark.read.parquet(str(tmp_path / "out")).collect()
        kept = sorted(r["doc_id"] for r in out)
        # both NULL-text docs survive; exactly one of the text dups does
        # (within one micro-batch the survivor is arbitrary)
        assert len(kept) == 3 and kept[:2] == ["media_1", "media_2"]
        assert kept[2] in ("t", "t_dup")

    def test_batch_twin_null_text_docs_are_exempt(self, spark):
        from n8n_tools_api_spark.streaming import dedup_batch_twin

        base = datetime.datetime(2024, 6, 1, 12, 0, 0)
        df = spark.createDataFrame(
            [("media_1", base, None),
             ("media_2", base + datetime.timedelta(minutes=1), None),
             ("t", base + datetime.timedelta(minutes=2), "real text"),
             ("t_dup", base + datetime.timedelta(minutes=3), "real text")],
            "doc_id string, event_time timestamp, text string",
        )
        kept = sorted(r["doc_id"] for r in dedup_batch_twin(df).collect())
        assert kept == ["media_1", "media_2", "t"]

    def test_batch_twin_first_seen_wins(self, spark):
        from n8n_tools_api_spark.streaming import dedup_batch_twin

        base = datetime.datetime(2024, 6, 1, 12, 0, 0)
        df = spark.createDataFrame(
            [("late_dup", base + datetime.timedelta(minutes=9), "x y z"),
             ("first", base, "x y z"),
             ("solo", base + datetime.timedelta(minutes=1), "unique")],
            "doc_id string, event_time timestamp, text string",
        )
        kept = sorted(r["doc_id"] for r in dedup_batch_twin(df).collect())
        assert kept == ["first", "solo"]
