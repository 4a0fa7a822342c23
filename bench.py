#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line.

Runs the engine's headline operators at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``:

* the extraction pipeline over the deterministic bench corpus
  (generation is cached to parquet and excluded from timing — both
  parallelism levels read the same bytes);
* the relational / dedup / similarity headline queries from the
  catalog.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": <sf>, "extraction": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "120000"))
# best-of-3: this shared VM has minutes-long noisy-neighbor windows and
# per-query swings of 2-3x between back-to-back runs were measured —
# three repeats per query is the cheapest defensible noise floor
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
OUT_DIR = os.environ.get("SPARK_GRAFT_BENCH_OUT", "/tmp/spark_graft_bench")


def main() -> None:
    from n8n_tools_api_spark.operators import extract_spans
    from n8n_tools_api_spark.plans import ORACLE_QUERIES, PIPELINE_QUERIES
    from n8n_tools_api_spark.session import get_spark
    from n8n_tools_api_spark.sources import bench_corpus

    spark = get_spark(
        app_name="n8n-tools-api-spark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so the first timed query isn't charged for it
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1000).count()

    timings: dict[str, float] = {}
    # 1-min load average before/after each timed run: every perf dispute
    # in rounds 3-4 reduced to "was the box noisy?" — record the context
    loads: dict[str, list[float]] = {}

    def timed(name: str, fn) -> None:
        # best-of-REPEATS: the sandbox VM has noisy-neighbor windows
        best = None
        load0 = os.getloadavg()[0]
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            fn()
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
        timings[name] = round(best, 3)
        loads[name] = [round(load0, 1), round(os.getloadavg()[0], 1)]

    # --- extraction throughput (the BASELINE.json metric) ---------------
    corpus = bench_corpus(spark, BENCH_DOCS)  # cached; builds on first run
    # size input splits to ~4 task waves per core (a production job sets
    # this for its cluster; the default 128MB split would serialize the
    # small bench corpus onto a handful of cores)
    n_rows = corpus.count()  # materialize scan metadata outside the timed window
    est_bytes = max(n_rows * 900, 1 << 20)  # ~900B/doc parquet footprint
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(est_bytes // (CPUS * 4), 1 << 20)))
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024))
    extract_sec = None
    load0 = os.getloadavg()[0]
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        extract_spans(corpus).write.mode("overwrite").parquet(f"{OUT_DIR}/extracted")
        sec = time.perf_counter() - t0
        extract_sec = sec if extract_sec is None else min(extract_sec, sec)
    timings["extract_pipeline"] = round(extract_sec, 3)
    loads["extract_pipeline"] = [round(load0, 1), round(os.getloadavg()[0], 1)]

    # --- headline catalog queries ---------------------------------------
    for name in (
        "q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
        "q10_returned_items", "customer_acctbal_rank", "nation_revenue_rollup",
        "events_daily", "doc_token_counts", "doc_quality_scores",
        "exact_dedup_stats", "cosine_topk", "formatted_fingerprints",
        "curation_keep_list", "lineage_health", "url_landing",
        "gopher_word_stats", "c4_line_filter", "c4_badwords",
        "boilerplate_strip",
        "c4_curation_keep_list", "c4_span_dedup", "pii_redaction",
        "host_cap_keep_list", "benchmark_decontam", "url_blocklist",
        "mixture_sample_report", "web_curation_keep_list",
        "exact_substr_dedup", "token_pack_manifest", "dsir_selection",
        "quality_classifier", "classifier_curation_keep_list",
        "lm_perplexity_buckets", "ccnet_keep_list",
        "line_dedup", "shard_manifest", "bpe_merges",
        "bpe_encoded_tokens", "bpe_pack_manifest", "dataset_card",
        "url_canonical_dedup", "repeated_line_strip", "host_link_stats",
        "web_dedup_keep_list", "corpus_expectations",
    ):
        fn, _ = ORACLE_QUERIES[name]
        timed(name, lambda fn=fn: fn(spark, SF_DIR).collect())

    for name in ("minhash_near_dups", "simhash_near_dups", "ann_ivf_topk",
                 "semdedup_status_counts"):
        fn = PIPELINE_QUERIES[name]
        timed(name, lambda fn=fn: fn(spark, SF_DIR).collect())

    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "load_1min": loads,
        "sf": sf,
        "extraction": {
            "docs": BENCH_DOCS,
            "seconds": round(extract_sec, 3),
            "docs_per_sec": round(BENCH_DOCS / extract_sec, 1),
            "cpus": CPUS,
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
