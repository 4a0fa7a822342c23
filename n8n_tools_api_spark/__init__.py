"""n8n_tools_api_spark — a from-scratch PySpark-native extraction engine.

Re-expresses the data-processing capabilities of the reference FastAPI
service (jneaimi/n8n-tools-api, studied read-only at /root/reference) as
batch DataFrame transforms over a table of interleaved text+media
documents::

    documents_interleaved (
        doc_id  STRING,
        spans   ARRAY<STRUCT<kind:STRING, text:STRING,
                             media_ref:STRING, offset:INT>>
    )

Layout
------
refsem/     pure-Python reference semantics (exact-equality surface);
            shared by the golden generator AND the pandas UDFs so the
            two can never disagree.
operators/  Spark DataFrame operators (extraction pipeline, media
            externalization, PDF split/merge plans, dedup, similarity,
            text stats, multimodal plumbing).
sources/    deterministic synthetic corpus generator + testdata loaders.
functions/  reusable column-expression helpers (JVM-side, codegen'd).
plans/      the query catalog surfaced through __spark_entry__.py.
streaming/  incremental-ingest wrapper (Trigger.AvailableNow).
"""

__version__ = "0.1.0"
