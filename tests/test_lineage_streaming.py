"""Idempotent resume (operators/lineage.py) + incremental ingest
(streaming/incremental.py) — the north_rule checkpoint/resume story."""

import pytest

from n8n_tools_api_spark.operators import extract_spans
from n8n_tools_api_spark.operators.lineage import (
    lineage_metrics,
    read_extracted,
    resumable_extract,
)
from n8n_tools_api_spark.sources import interleaved_df
from n8n_tools_api_spark.streaming import incremental_extract

N_DOCS = 120


def _spans_map(df):
    return {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in df.collect()}


class TestResumableExtract:
    def test_full_run_matches_direct_pipeline(self, spark, tmp_path):
        docs = interleaved_df(spark, N_DOCS)
        out = str(tmp_path / "run_full")
        res = resumable_extract(spark, docs, out, run_id="r1", n_buckets=8,
                                group_size=3)
        assert sorted(res["processed_buckets"]) == list(range(8))
        assert res["skipped_buckets"] == []
        assert _spans_map(read_extracted(spark, out)) == \
            _spans_map(extract_spans(docs))

    def test_crash_then_resume_is_idempotent(self, spark, tmp_path):
        docs = interleaved_df(spark, N_DOCS)
        out = str(tmp_path / "run_crash")
        with pytest.raises(RuntimeError, match="simulated crash"):
            resumable_extract(spark, docs, out, run_id="r2", n_buckets=8,
                              group_size=3, fail_after_groups=1)
        # resume: must skip the committed group and complete the rest
        res = resumable_extract(spark, docs, out, run_id="r2", n_buckets=8,
                                group_size=3)
        assert len(res["skipped_buckets"]) == 3
        assert len(res["processed_buckets"]) == 5
        assert _spans_map(read_extracted(spark, out)) == \
            _spans_map(extract_spans(docs))
        # lineage accounts for every bucket exactly once
        m = lineage_metrics(spark, out).where("run_id = 'r2'").collect()[0]
        assert m["buckets_committed"] == 8
        assert m["docs"] == N_DOCS

    def test_rerun_of_complete_run_is_a_noop(self, spark, tmp_path):
        docs = interleaved_df(spark, N_DOCS)
        out = str(tmp_path / "run_noop")
        resumable_extract(spark, docs, out, run_id="r3", n_buckets=4, group_size=2)
        res = resumable_extract(spark, docs, out, run_id="r3", n_buckets=4,
                                group_size=2)
        assert res["processed_buckets"] == []
        assert res["skipped_buckets"] == [0, 1, 2, 3]


class TestLineageEdgeCases:
    def test_sparse_input_commits_empty_buckets(self, spark, tmp_path):
        """Review finding: a group whose buckets hold no docs must not
        crash (no parquet read-back) and must still COMMIT so resume
        skips it."""
        docs = interleaved_df(spark, 3)  # 3 docs over 16 buckets
        out = str(tmp_path / "sparse")
        res = resumable_extract(spark, docs, out, run_id="sparse",
                                n_buckets=16, group_size=4)
        assert len(res["processed_buckets"]) == 16
        # every bucket has a lineage row, incl. zero-doc ones
        lin = spark.read.parquet(f"{out}/_lineage")
        rows = {r["bucket"]: r["doc_count"] for r in lin.collect()}
        assert len(rows) == 16
        assert sum(rows.values()) == 3
        # rerun: everything skipped, nothing reprocessed
        res2 = resumable_extract(spark, docs, out, run_id="sparse",
                                 n_buckets=16, group_size=4)
        assert res2["processed_buckets"] == []

    def test_new_run_id_does_not_inherit_stale_partitions(self, spark, tmp_path):
        """Review finding: reusing out_dir with a new run_id over input
        missing a bucket must not attribute the old run's rows to the
        new run's lineage."""
        out = str(tmp_path / "reuse")
        docs_a = interleaved_df(spark, 60)
        resumable_extract(spark, docs_a, out, run_id="A", n_buckets=4,
                          group_size=4)
        docs_b = interleaved_df(spark, 6)  # much sparser input
        resumable_extract(spark, docs_b, out, run_id="B", n_buckets=4,
                          group_size=4)
        lin = spark.read.parquet(f"{out}/_lineage")
        b_total = sum(r["doc_count"] for r in lin.where("run_id = 'B'").collect())
        assert b_total == 6  # only run B's own docs, never run A's
        # and the DATA dir holds exactly run B's documents — a bucket
        # that run B left empty must not expose run A's files
        data_ids = {r["doc_id"] for r in read_extracted(spark, out).collect()}
        assert data_ids == {r["doc_id"] for r in docs_b.collect()}


class TestIncrementalExtract:
    def test_only_new_files_are_processed(self, spark, tmp_path):
        inp = str(tmp_path / "incoming")
        outp = str(tmp_path / "extracted")
        ckpt = str(tmp_path / "ckpt")

        first = interleaved_df(spark, 40)
        first.write.mode("append").parquet(inp)
        incremental_extract(spark, inp, outp, ckpt)
        n1 = spark.read.parquet(outp).count()
        assert n1 == 40

        second = interleaved_df(spark, 70, seed=7).where("doc_id >= 'doc_000040'")
        second.write.mode("append").parquet(inp)
        incremental_extract(spark, inp, outp, ckpt)
        got = spark.read.parquet(outp)
        assert got.count() == 40 + second.count()
        # the first batch's docs were NOT reprocessed (exactly-once by
        # checkpoint): doc_ids stay unique
        assert got.select("doc_id").distinct().count() == got.count()
