"""Iceberg deployment-contract pins (sources/iceberg_ddl.py).

The sandbox has no Iceberg runtime jar, so the MERGE / DDL branch is
UNEXERCISED here by construction (documented in the module and
VERDICT r3 #8) — local runs dispatch to the parquet warehouse twin.
These tests pin the contract STRINGS a cluster run would issue, so a
refactor can't silently drift the table names, partition transforms,
or the idempotency key the resume protocol depends on.
"""

from n8n_tools_api_spark.sources.iceberg_ddl import (
    DOCUMENTS_INTERLEAVED_DDL,
    EXTRACTED_SPANS_DDL,
    LINEAGE_DDL,
    LINEAGE_MERGE,
    MEDIA_BLOBS_DDL,
)


class TestDDLContract:
    def test_documents_table_matches_input_hint_schema(self):
        ddl = DOCUMENTS_INTERLEAVED_DDL
        assert "doc_id STRING" in ddl
        assert ("spans  ARRAY<STRUCT<kind:STRING, text:STRING, "
                "media_ref:STRING, offset:INT>>") in ddl
        # 10^12 docs / 4096 buckets ≈ 250M docs per bucket (SURVEY §4)
        assert "PARTITIONED BY (bucket(4096, doc_id))" in ddl
        assert "'format-version' = '2'" in ddl

    def test_extracted_spans_partitioned_on_resume_bucket(self):
        # identity partition on the content-derived bucket column so
        # overwritePartitions() replaces exactly a run's bucket groups
        assert "PARTITIONED BY (bucket)" in EXTRACTED_SPANS_DDL
        assert "bucket INT" in EXTRACTED_SPANS_DDL

    def test_media_blobs_partitioned_by_key_prefix(self):
        assert "PARTITIONED BY (truncate(2, media_key))" in MEDIA_BLOBS_DDL
        assert "media_bytes BINARY" in MEDIA_BLOBS_DDL

    def test_lineage_merge_key_is_run_and_bucket(self):
        # the idempotency key: re-committing a bucket must UPDATE, not
        # duplicate, or resume would double-count
        assert "ON t.run_id = u.run_id AND t.bucket = u.bucket" \
            in LINEAGE_MERGE
        assert "WHEN MATCHED THEN UPDATE SET *" in LINEAGE_MERGE
        assert "WHEN NOT MATCHED THEN INSERT *" in LINEAGE_MERGE
        for col in ("run_id STRING", "bucket INT", "doc_count BIGINT",
                    "span_count BIGINT", "media_ref_count BIGINT",
                    "wall_ms BIGINT"):
            assert col in LINEAGE_DDL
