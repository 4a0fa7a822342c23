"""applyInPandasWithState sessionizer vs its batch twin."""

from n8n_tools_api_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_stream,
)


def _key(r):
    return (r["user_id"], str(r["session_start"]))


def test_stream_emits_exactly_the_closed_sessions(spark, sf_dir, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")

    sessionize_stream(spark, str(in_dir), str(tmp_path / "out"),
                      str(tmp_path / "ckpt"))
    stream = spark.read.parquet(str(tmp_path / "out")).collect()

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = sessionize_batch(events).collect()

    # streaming keeps each user's LAST session open in state: expected =
    # all batch sessions minus the latest per user
    latest = {}
    for r in batch:
        if r["user_id"] not in latest or r["session_start"] > latest[r["user_id"]]:
            latest[r["user_id"]] = r["session_start"]
    expected = {
        _key(r): (r["session_end"], r["n_events"], r["total_value"])
        for r in batch if r["session_start"] != latest[r["user_id"]]
    }
    got = {
        _key(r): (r["session_end"], r["n_events"], r["total_value"])
        for r in stream
    }
    assert len(expected) > 50, "fixture should close many sessions"
    assert got == expected


def test_state_carries_across_batches(spark, tmp_path):
    """An event landing later that continues a session must EXTEND the
    open session in state, not start a new one."""
    import datetime

    base = datetime.datetime(2024, 6, 1, 12, 0, 0)
    schema = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
              "event_type string, value double, props string")
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    first = spark.createDataFrame(
        [(1, base, 7, "click", 1.0, ""),
         (2, base + datetime.timedelta(minutes=10), 7, "view", 2.0, "")],
        schema)
    first.write.mode("append").parquet(str(in_dir / "b1"))
    sessionize_stream(spark, str(in_dir / "b1"), str(tmp_path / "out1"),
                      str(tmp_path / "ck1"))

    # continuation lands in a second drain of the SAME checkpoint dir
    both = tmp_path / "in2"
    both.mkdir()
    first.write.mode("append").parquet(str(both))
    sessionize_stream(spark, str(both), str(tmp_path / "out2"),
                      str(tmp_path / "ck2"))
    second = spark.createDataFrame(
        [(3, base + datetime.timedelta(minutes=15), 7, "buy", 3.0, ""),
         # and an event after a >30min gap: closes the extended session
         (4, base + datetime.timedelta(minutes=90), 7, "click", 4.0, "")],
        schema)
    second.write.mode("append").parquet(str(both))
    sessionize_stream(spark, str(both), str(tmp_path / "out2"),
                      str(tmp_path / "ck2"))

    rows = spark.read.parquet(str(tmp_path / "out2")).collect()
    assert len(rows) == 1
    closed = rows[0]
    # the closed session spans ALL THREE continuation events (1.0+2.0+3.0)
    assert closed["n_events"] == 3
    assert closed["total_value"] == 6.0
