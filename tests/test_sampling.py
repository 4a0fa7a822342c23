"""Deterministic stratified mixture sampling (operators/sampling.py) —
semantics pins backing the ``mixture_sample_report`` oracle."""

import hashlib

import pytest
from pyspark.sql import functions as F

from n8n_tools_api_spark.operators.sampling import (
    KEEP_ALL_THRESHOLD, mixture_report, sample_threshold_hex,
    stratified_sample,
)


def _corpus(spark, n=400):
    return spark.range(n).select(
        F.col("id").cast("string").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "a")
        .when(F.col("id") % 4 == 1, "b")
        .when(F.col("id") % 4 == 2, "c")
        .otherwise(F.lit(None).cast("string")).alias("lang"),
    )


class TestThreshold:
    def test_oracle_literal_parity(self):
        # the MIXTURE_SAMPLE_SQL CASE literals must be exactly these
        assert sample_threshold_hex(1.0) == KEEP_ALL_THRESHOLD == "g"
        assert sample_threshold_hex(0.5) == "80000000"
        assert sample_threshold_hex(0.25) == "40000000"
        assert sample_threshold_hex(0.1) == "19999999"
        assert sample_threshold_hex(0.0) == "00000000"
        assert sample_threshold_hex(0.75) == "c0000000"

    def test_out_of_range_raises(self):
        for bad in (-0.1, 1.5):
            with pytest.raises(ValueError):
                sample_threshold_hex(bad)

    def test_keep_all_sentinel_sorts_above_hex(self):
        assert "ffffffff" < KEEP_ALL_THRESHOLD


class TestStratifiedSample:
    def test_rate_one_and_zero_are_exact(self, spark):
        docs = _corpus(spark)
        kept = stratified_sample(docs, {"a": 1.0, "b": 0.0},
                                 default_rate=0.5)
        langs = {r["lang"] for r in kept.collect()}
        assert "b" not in langs
        assert kept.where("lang = 'a'").count() == 100

    def test_matches_driver_side_md5_decision(self, spark):
        # the keep set is exactly what hashlib predicts row by row
        docs = _corpus(spark, 100)
        kept = {r["doc_id"] for r in
                stratified_sample(docs, {"a": 0.5}, seed=7,
                                  default_rate=0.25).collect()}
        for i in range(100):
            lang = ["a", "b", "c", None][i % 4]
            thr = "80000000" if lang == "a" else "40000000"
            key = hashlib.md5(f"7:{i}".encode()).hexdigest()[:8]
            assert (str(i) in kept) == (key < thr), (i, lang, key)

    def test_partition_layout_invariance(self, spark):
        docs = _corpus(spark)
        a = {r["doc_id"] for r in
             stratified_sample(docs, {"a": 0.3}).collect()}
        b = {r["doc_id"] for r in
             stratified_sample(docs.repartition(13), {"a": 0.3}).collect()}
        assert a == b

    def test_seed_changes_sample_not_size_class(self, spark):
        docs = _corpus(spark)
        s1 = {r["doc_id"] for r in
              stratified_sample(docs, {}, seed=1, default_rate=0.5).collect()}
        s2 = {r["doc_id"] for r in
              stratified_sample(docs, {}, seed=2, default_rate=0.5).collect()}
        assert s1 != s2

    def test_null_stratum_uses_default_rate(self, spark):
        docs = _corpus(spark)
        kept = stratified_sample(docs, {"a": 0.0, "b": 0.0, "c": 0.0},
                                 default_rate=1.0)
        rows = kept.collect()
        assert len(rows) == 100
        assert all(r["lang"] is None for r in rows)


class TestMixtureReport:
    def test_report_counts_match_sampler(self, spark):
        docs = _corpus(spark)
        rates = {"a": 0.5, "b": 0.1}
        rep = {r["stratum"]: r for r in
               mixture_report(docs, rates, default_rate=0.75).collect()}
        kept = stratified_sample(docs, rates, default_rate=0.75)
        for stratum in ("a", "b", "c", None):
            cond = "lang is null" if stratum is None \
                else f"lang = '{stratum}'"
            assert rep[stratum]["n_kept"] == kept.where(cond).count()
            assert rep[stratum]["n_docs"] == 100

    def test_report_threshold_column(self, spark):
        rep = {r["stratum"]: r["threshold"] for r in
               mixture_report(_corpus(spark), {"a": 1.0, "b": 0.25},
                              default_rate=0.0).collect()}
        assert rep["a"] == "g"
        assert rep["b"] == "40000000"
        assert rep["c"] == rep[None] == "00000000"

    def test_sampler_plan_is_shuffle_free(self, spark):
        plan = stratified_sample(_corpus(spark), {"a": 0.5}) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
