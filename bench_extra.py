#!/usr/bin/env python
"""Per-query profiling harness (guide §1) — NOT the frozen bench.py.

Times individual catalog/pipeline queries in isolation with the same
session + methodology as bench.py (collect(), best-of-REPEATS), but
adds:

* ``--queries a,b,c`` to time a subset;
* ``--explain DIR``    to write .explain("formatted") per query;
* ``--noop``           to time with the noop sink instead of collect();
* job descriptions so the timeline is attributable.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPEATS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

HEADLINE = [
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
    "minhash_near_dups", "simhash_near_dups", "ann_ivf_topk",
    "semdedup_status_counts",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="",
                    help="comma-separated subset (default: headline list)")
    ap.add_argument("--explain", default="",
                    help="directory to write <name>.txt formatted plans")
    ap.add_argument("--noop", action="store_true",
                    help="time df.write.format('noop') instead of collect()")
    ap.add_argument("--tag", default="", help="label echoed into the output")
    args = ap.parse_args()

    from n8n_tools_api_spark.plans import ORACLE_QUERIES, PIPELINE_QUERIES
    from n8n_tools_api_spark.session import get_spark

    spark = get_spark(
        app_name="n8n-tools-api-spark-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1000).count()
    # mirror the conf state the frozen bench.py times catalog queries
    # under (it sizes splits for the 120k-doc extraction corpus and the
    # setting persists into the catalog section)
    est_bytes = max(int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "120000")) * 900,
                    1 << 20)
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(est_bytes // (CPUS * 4), 1 << 20)))
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024))

    names = [q.strip() for q in args.queries.split(",") if q.strip()] or HEADLINE
    if args.explain:
        os.makedirs(args.explain, exist_ok=True)

    timings: dict[str, float] = {}
    for name in names:
        if name in ORACLE_QUERIES:
            fn = ORACLE_QUERIES[name][0]
        else:
            fn = PIPELINE_QUERIES[name]
        if args.explain:
            df = fn(spark, SF_DIR)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
            continue
        best = None
        for _ in range(REPEATS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}", file=sys.stderr, flush=True)

    if not args.explain:
        print(json.dumps({
            "tag": args.tag, "sf_dir": SF_DIR, "cpus": CPUS,
            "repeats": REPEATS, "noop": args.noop,
            "total": round(sum(timings.values()), 3),
            "queries": timings,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
