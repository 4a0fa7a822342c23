"""Watermarked windowed streaming vs its batch twin over events."""

import datetime

from n8n_tools_api_spark.streaming import (
    windowed_event_counts_batch,
    windowed_event_counts_stream,
)


def test_stream_matches_batch_for_closed_windows(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = windowed_event_counts_batch(events).collect()
    max_ts = max(r["ts"] for r in events.select("ts").collect())

    # readStream wants a directory; testdata ships single parquet files
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")

    windowed_event_counts_stream(
        spark, str(in_dir), str(tmp_path / "out"),
        str(tmp_path / "ckpt"), watermark="0 seconds",
    )
    stream = spark.read.parquet(str(tmp_path / "out")).collect()

    def key(r):
        return (str(r["window_start"]), r["event_type"])

    got = {key(r): (r["n_events"], r["total_value"]) for r in stream}
    # append mode emits only watermark-closed windows: those whose end
    # (start + 60 min) is <= the final watermark (= max event ts here)
    expected = {
        key(r): (r["n_events"], r["total_value"])
        for r in batch
        if r["window_start"] + datetime.timedelta(minutes=60) <= max_ts
    }
    assert expected, "fixture should close at least one window"
    assert got == expected


def test_late_event_is_dropped_by_watermark(spark, tmp_path):
    import datetime

    schema = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
              "event_type string, value double, props string")
    base = datetime.datetime(2024, 6, 1, 12, 0, 0)
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    spark.createDataFrame(
        [(1, base, 1, "click", 1.0, ""),
         (2, base + datetime.timedelta(hours=3), 1, "view", 2.0, "")],
        schema).write.mode("append").parquet(str(in_dir))
    windowed_event_counts_stream(spark, str(in_dir), str(tmp_path / "out"),
                                 str(tmp_path / "ckpt"), watermark="0 seconds")
    n1 = spark.read.parquet(str(tmp_path / "out")).count()

    # a late event 3 hours behind the watermark: its window already
    # closed — the second drain must not emit or modify anything
    spark.createDataFrame(
        [(3, base + datetime.timedelta(minutes=5), 1, "late", 99.0, "")],
        schema).write.mode("append").parquet(str(in_dir))
    windowed_event_counts_stream(spark, str(in_dir), str(tmp_path / "out"),
                                 str(tmp_path / "ckpt"), watermark="0 seconds")
    out = spark.read.parquet(str(tmp_path / "out")).collect()
    assert len(out) == n1
    assert all(r["total_value"] != 99.0 for r in out)
