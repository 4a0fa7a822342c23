"""Streaming MinHash near-dup prefilter vs its batch twin."""

import datetime


def _run_stream(spark, in_dir, out_dir, ckpt_dir, watermark="10 minutes"):
    from n8n_tools_api_spark.streaming import neardup_prefilter_stream

    schema = "doc_id string, event_time timestamp, text string"
    stream = spark.readStream.schema(schema).parquet(str(in_dir))
    q = (
        neardup_prefilter_stream(stream, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt_dir))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _mk_text(seed: str, n: int = 60) -> str:
    return " ".join(f"{seed}w{j}" for j in range(n))


class TestNeardupPrefilterStream:
    def test_exact_copy_within_watermark_is_suppressed(self, spark, tmp_path):
        base = datetime.datetime(2024, 6, 1, 12, 0, 0)
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        schema = "doc_id string, event_time timestamp, text string"
        # batch 1: originals claim their buckets
        spark.createDataFrame(
            [("a", base, _mk_text("alpha")),
             ("b", base + datetime.timedelta(minutes=1), _mk_text("beta"))],
            schema).write.mode("append").parquet(str(in_dir))
        _run_stream(spark, in_dir, tmp_path / "out", tmp_path / "ckpt",
                    watermark="2 hours")
        # batch 2: an exact copy (all 16 bands collide → suppressed) and
        # a genuinely new doc (16 novel bands → passes)
        spark.createDataFrame(
            [("a_copy", base + datetime.timedelta(minutes=30), _mk_text("alpha")),
             ("c", base + datetime.timedelta(minutes=31), _mk_text("gamma"))],
            schema).write.mode("append").parquet(str(in_dir))
        _run_stream(spark, in_dir, tmp_path / "out", tmp_path / "ckpt",
                    watermark="2 hours")
        kept = sorted(r["doc_id"]
                      for r in spark.read.parquet(str(tmp_path / "out")).collect())
        assert kept == ["a", "b", "c"]

    def test_partial_overlap_passes(self, spark, tmp_path):
        from n8n_tools_api_spark.operators.dedup import minhash_banded

        base = datetime.datetime(2024, 6, 1, 12, 0, 0)
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        schema = "doc_id string, event_time timestamp, text string"
        text = _mk_text("delta", 100)
        near = " ".join(text.split()[:90])  # 90% truncation: near-dup
        # sanity: the near-dup shares SOME but not ALL band buckets —
        # a batch LSH candidate, yet novel enough to pass the prefilter
        bb = spark.createDataFrame(
            [("d", text), ("d_near", near)], "doc_id string, text string")
        buckets = {(r["doc_id"], r["band"], r["bucket"])
                   for r in minhash_banded(bb).collect()}
        shared = {(b, v) for d, b, v in buckets if d == "d"} \
            & {(b, v) for d, b, v in buckets if d == "d_near"}
        assert 1 <= len(shared) < 16
        spark.createDataFrame(
            [("d", base, text)], schema).write.mode("append").parquet(str(in_dir))
        _run_stream(spark, in_dir, tmp_path / "out", tmp_path / "ckpt",
                    watermark="2 hours")
        spark.createDataFrame(
            [("d_near", base + datetime.timedelta(minutes=5), near)],
            schema).write.mode("append").parquet(str(in_dir))
        _run_stream(spark, in_dir, tmp_path / "out", tmp_path / "ckpt",
                    watermark="2 hours")
        kept = sorted(r["doc_id"]
                      for r in spark.read.parquet(str(tmp_path / "out")).collect())
        assert kept == ["d", "d_near"]

    def test_stream_matches_batch_twin_on_ordered_arrival(self, spark, tmp_path):
        from n8n_tools_api_spark.streaming import neardup_prefilter_batch_twin

        base = datetime.datetime(2024, 6, 1, 12, 0, 0)
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        schema = "doc_id string, event_time timestamp, text string"
        rows = [
            ("a", base, _mk_text("alpha")),
            ("b", base + datetime.timedelta(minutes=1), _mk_text("beta")),
        ]
        rows2 = [
            ("a_copy", base + datetime.timedelta(minutes=2), _mk_text("alpha")),
            ("c", base + datetime.timedelta(minutes=3), _mk_text("gamma")),
        ]
        spark.createDataFrame(rows, schema).write.mode("append") \
            .parquet(str(in_dir))
        _run_stream(spark, in_dir, tmp_path / "out", tmp_path / "ckpt",
                    watermark="2 hours")
        spark.createDataFrame(rows2, schema).write.mode("append") \
            .parquet(str(in_dir))
        _run_stream(spark, in_dir, tmp_path / "out", tmp_path / "ckpt",
                    watermark="2 hours")
        stream_docs = {r["doc_id"]
                       for r in spark.read.parquet(str(tmp_path / "out")).collect()}
        twin_docs = {r["doc_id"]
                     for r in neardup_prefilter_batch_twin(
                         spark.createDataFrame(rows + rows2, schema)).collect()}
        assert stream_docs == twin_docs == {"a", "b", "c"}

    def test_sf_query_suppresses_all_planted_copies(self, spark, sf_dir):
        from n8n_tools_api_spark.plans.pipeline_queries import (
            stream_neardup_prefilter)

        rows = stream_neardup_prefilter(spark, sf_dir).collect()
        ids = [r["doc_id"] for r in rows]
        # every later-arriving planted copy drops (all 16 bands collide)
        assert not any(i.startswith("dup_") for i in ids)
        # originals pass unless they are natural all-band collisions
        # with an earlier original (a handful exist in the sf corpus —
        # suppressing those is the prefilter working, not a bug)
        assert not any("_" in i for i in ids)  # only originals pass
        assert len(ids) >= 190

    def test_null_text_docs_are_exempt(self, spark, tmp_path):
        """Media-only (NULL-text) docs fold to the identical all-NULL
        MinHash signature (concat_ws skips NULLs), so without the
        doc-unique bucket salt the first one would suppress ALL later
        ones inside the watermark — silent data loss directly upstream
        of extraction. Every media-only doc must pass."""
        base = datetime.datetime(2024, 6, 1, 12, 0, 0)
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        schema = "doc_id string, event_time timestamp, text string"
        spark.createDataFrame(
            [("media_1", base, None),
             ("t", base + datetime.timedelta(minutes=1), _mk_text("alpha"))],
            schema).write.mode("append").parquet(str(in_dir))
        _run_stream(spark, in_dir, tmp_path / "out", tmp_path / "ckpt",
                    watermark="2 hours")
        spark.createDataFrame(
            [("media_2", base + datetime.timedelta(minutes=2), None),
             ("media_3", base + datetime.timedelta(minutes=3), None),
             ("t_copy", base + datetime.timedelta(minutes=4), _mk_text("alpha"))],
            schema).write.mode("append").parquet(str(in_dir))
        _run_stream(spark, in_dir, tmp_path / "out", tmp_path / "ckpt",
                    watermark="2 hours")
        kept = sorted(r["doc_id"]
                      for r in spark.read.parquet(str(tmp_path / "out")).collect())
        # all three media-only docs survive; the exact text copy drops
        assert kept == ["media_1", "media_2", "media_3", "t"]

    def test_batch_twin_null_text_docs_are_exempt(self, spark):
        from n8n_tools_api_spark.streaming import neardup_prefilter_batch_twin

        base = datetime.datetime(2024, 6, 1, 12, 0, 0)
        df = spark.createDataFrame(
            [("media_1", base, None),
             ("media_2", base + datetime.timedelta(minutes=1), None),
             ("t", base + datetime.timedelta(minutes=2), _mk_text("alpha")),
             ("t_copy", base + datetime.timedelta(minutes=3), _mk_text("alpha"))],
            "doc_id string, event_time timestamp, text string",
        )
        out = {r["doc_id"]: r["novel_bands"]
               for r in neardup_prefilter_batch_twin(df).collect()}
        # every media-only doc claims all 16 (salted) buckets
        assert out == {"media_1": 16, "media_2": 16, "t": 16}

    def test_batch_twin_first_claim_is_event_time_ordered(self, spark):
        from n8n_tools_api_spark.streaming import neardup_prefilter_batch_twin

        base = datetime.datetime(2024, 6, 1, 12, 0, 0)
        df = spark.createDataFrame(
            [("late_copy", base + datetime.timedelta(minutes=9), _mk_text("x")),
             ("first", base, _mk_text("x")),
             ("solo", base + datetime.timedelta(minutes=1), _mk_text("y"))],
            "doc_id string, event_time timestamp, text string",
        )
        out = {r["doc_id"]: r["novel_bands"]
               for r in neardup_prefilter_batch_twin(df).collect()}
        assert out == {"first": 16, "solo": 16}
