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
