#!/usr/bin/env python
"""Phase-level attribution for BENCH suite 3 (composed curation).

Replays curation_keep_list(use_lsh=True) with an eager materialization
and a timer between phases, so the 2-core vs 8-core wall is split into:

  extract_rank   extraction + F1 clean + md5 window (→ ranked frame)
  lsh_candidates MinHash signatures + banded bucket self-join
  jaccard        exact n-gram scoring of candidates
  components     min-label / pointer-jumping loop (+ round count)
  rollup         final keep-list union + status counts

Usage: python scripts/profile_curation_phases.py <cpus> <corpus_dir>
Prints one PROFILE json line. Phase boundaries force materialization,
so the total is a few % above the real fused run — the per-phase RATIO
between parallelism levels is the signal, not the absolute total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
CORPUS = sys.argv[2] if len(sys.argv) > 2 else \
    "/tmp/spark_graft_bench/curation_corpus_r96.parquet"


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from n8n_tools_api_spark.operators import dedup as dd
    from n8n_tools_api_spark.operators.curation import cleaned_documents
    from n8n_tools_api_spark.session import get_spark

    spark = get_spark(app_name=f"curation-profile-{CPUS}",
                      master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    total_bytes = sum(
        os.path.getsize(os.path.join(CORPUS, f))
        for f in os.listdir(CORPUS) if f.endswith(".parquet"))
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(total_bytes // (CPUS * 4), 1 << 20)))
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024))
    docs = spark.read.parquet(CORPUS)
    n_docs = docs.count()

    phases: dict[str, float] = {}
    loads: dict[str, list[float]] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.l0 = os.getloadavg()[0]
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                phases[name] = round(time.perf_counter() - self.t0, 3)
                loads[name] = [round(self.l0, 1),
                               round(os.getloadavg()[0], 1)]
        return _T()

    with timed("extract_rank"):
        w = Window.partitionBy("h").orderBy("doc_id")
        ranked = (
            cleaned_documents(docs)
            .withColumn("h", F.md5(F.col("clean_text").cast("binary")))
            .withColumn("rn", F.row_number().over(w))
            .withColumn("canon_exact", F.first("doc_id").over(w))
        ).localCheckpoint(eager=True)
    survivors = ranked.where(F.col("rn") == 1).select("doc_id", "clean_text")

    with timed("lsh_candidates"):
        cands = (
            dd.minhash_lsh_candidates(survivors, text_col="clean_text",
                                      checkpoint_banded=True)
            .where(F.col("n_shared_bands") >= 2)
            .select("doc_a", "doc_b")
        ).localCheckpoint(eager=True)
        n_cands = cands.count()

    with timed("jaccard"):
        pairs = dd.ngram_jaccard_pairs(
            survivors, text_col="clean_text", k=5, threshold=0.5,
            candidate_pairs=cands, checkpoint_shingles=True,
        ).select("doc_a", "doc_b").localCheckpoint(eager=True)
        n_pairs = pairs.count()

    with timed("components"):
        comp = dd.near_dup_components(pairs).localCheckpoint(eager=True)
        n_comp = comp.count()

    with timed("rollup"):
        surv_out = (
            survivors.join(comp, "doc_id", "left")
            .select(
                "doc_id",
                F.when(
                    F.col("component").isNotNull()
                    & (F.col("component") != F.col("doc_id")),
                    F.lit("near_dup"),
                ).otherwise(F.lit("kept")).alias("status"),
            )
        )
        exact_out = ranked.where(F.col("rn") > 1).select(
            "doc_id", F.lit("exact_dup").alias("status"))
        counts = {r["status"]: r["n"] for r in
                  surv_out.unionByName(exact_out)
                  .groupBy("status").agg(F.count("*").alias("n")).collect()}

    print("PROFILE " + json.dumps({
        "cpus": CPUS, "docs": n_docs, "candidates": n_cands,
        "pairs": n_pairs, "labeled_docs": n_comp,
        "phases": phases, "load_1min": loads,
        "total": round(sum(phases.values()), 3), "counts": counts,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
