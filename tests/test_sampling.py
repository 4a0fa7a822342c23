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

    def test_threshold_always_eight_hex_digits(self):
        # rates just under 1.0 round int(rate*2^32) up to 2^32; a
        # 9-digit threshold would silently invert the lexicographic
        # comparison (round-5 review finding) — must clamp
        for r in (1 - 2**-53, 1 - 2**-40, 0.9999999999,
                  0.5, 0.1, 2**-40, 0.0):
            t = sample_threshold_hex(r)
            assert len(t) == 8 and set(t) <= set("0123456789abcdef"), (r, t)
        assert sample_threshold_hex(1 - 2**-53) == "ffffffff"


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


class TestTokenPack:
    """Concat-and-chunk packing manifest (operators/packing.py) —
    pins behind the ``token_pack_manifest`` oracle."""

    @staticmethod
    def _run(spark, rows, block_size=10, **kw):
        from n8n_tools_api_spark.operators.packing import token_pack

        df = spark.createDataFrame(rows, "doc_id string, text string")
        return {r["doc_id"]: r
                for r in token_pack(df, block_size, **kw).collect()}

    def test_layout_is_contiguous_with_separators(self, spark):
        out = self._run(spark, [
            ("a", "t1 t2 t3"),          # tokens 0-2, sep 3
            ("b", "u1 u2"),             # tokens 4-5, sep 6
            ("c", "v1"),                # token 7, sep 8
        ])
        assert (out["a"]["start_offset"], out["b"]["start_offset"],
                out["c"]["start_offset"]) == (0, 4, 7)
        assert out["b"]["first_block"] == out["b"]["last_block"] == 0

    def test_block_span_arithmetic(self, spark):
        # 25 tokens at block_size 10 → blocks 0..2
        out = self._run(spark, [("a", " ".join(f"t{j}" for j in range(25)))])
        a = out["a"]
        assert (a["first_block"], a["last_block"], a["n_blocks"]) == (0, 2, 3)

    def test_empty_and_null_docs_sit_at_their_separator(self, spark):
        out = self._run(spark, [
            ("a", " ".join(f"t{j}" for j in range(9))),  # 0-8, sep 9
            ("b", ""),                                   # sep at 10
            ("c", None),                                 # sep at 11
            ("d", "x"),                                  # token 12
        ])
        assert out["b"]["n_tokens"] == 0
        assert out["b"]["start_offset"] == 10
        assert out["b"]["first_block"] == out["b"]["last_block"] == 1
        assert out["c"]["start_offset"] == 11
        assert out["d"]["start_offset"] == 12

    def test_layout_partition_invariant(self, spark):
        from n8n_tools_api_spark.operators.packing import token_pack

        rows = [(f"d{i:02d}", " ".join(f"w{i}x{j}" for j in range(i + 1)))
                for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        a = {tuple(r) for r in token_pack(df, 16).collect()}
        b = {tuple(r) for r in token_pack(df.repartition(7), 16).collect()}
        assert a == b

    def test_shard_col_packs_independent_streams(self, spark):
        from n8n_tools_api_spark.operators.packing import token_pack

        rows = [("a1", "s1", "t1 t2"), ("a2", "s1", "u1"),
                ("b1", "s2", "v1 v2 v3")]
        df = spark.createDataFrame(
            rows, "doc_id string, shard string, text string")
        out = {r["doc_id"]: r for r in
               token_pack(df, 10, shard_col="shard").collect()}
        # each shard starts its own stream at offset 0
        assert out["a1"]["start_offset"] == 0
        assert out["a2"]["start_offset"] == 3
        assert out["b1"]["start_offset"] == 0
        assert out["b1"]["shard"] == "s2"

    def test_count_col_overrides_whitespace_count(self, spark):
        from n8n_tools_api_spark.operators.packing import token_pack

        df = spark.createDataFrame(
            [("a", "irrelevant", 7), ("b", "words here", 3)],
            "doc_id string, text string, bpe_count int")
        out = {r["doc_id"]: r for r in
               token_pack(df, 10, count_col="bpe_count").collect()}
        assert out["a"]["n_tokens"] == 7
        assert out["b"]["start_offset"] == 8   # 7 + 1 separator

    def test_invalid_block_size_raises(self, spark):
        from n8n_tools_api_spark.operators.packing import token_pack

        df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
        with pytest.raises(ValueError):
            token_pack(df, 0)


class TestShardManifest:
    """Deterministic shard layout (operators/packing.py:shard_manifest)."""

    def _df(self, spark, n=101):
        return spark.createDataFrame(
            [(f"doc{i:04d}",) for i in range(n)], "doc_id string")

    def test_ranked_round_robin_balances_and_is_a_permutation(self, spark):
        from n8n_tools_api_spark.operators.packing import shard_manifest

        out = shard_manifest(self._df(spark), 7, seed=13).collect()
        sizes = {}
        seen = set()
        for r in out:
            sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
            seen.add((r["shard"], r["pos_in_shard"]))
        # 101 docs over 7 shards: sizes differ by at most one
        assert max(sizes.values()) - min(sizes.values()) <= 1
        # (shard, pos) pairs are unique and positions are dense
        assert len(seen) == 101
        for sh, n in sizes.items():
            assert {p for s, p in seen if s == sh} == set(range(n))

    def test_hashed_mode_matches_hashlib_replay(self, spark):
        import hashlib

        from n8n_tools_api_spark.operators.packing import shard_manifest

        out = shard_manifest(self._df(spark), 5, seed=13,
                             mode="hashed").collect()
        for r in out:
            h = hashlib.md5(f"13:{r['doc_id']}".encode()).hexdigest()
            assert r["shard"] == int(h[:8], 16) % 5
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
        for poss in by_shard.values():
            assert sorted(poss) == list(range(len(poss)))

    def test_layout_invariance_and_seed_sensitivity(self, spark):
        from n8n_tools_api_spark.operators.packing import shard_manifest

        df = self._df(spark, 60)
        a = sorted(map(tuple, shard_manifest(df.repartition(3), 4).collect()))
        b = sorted(map(tuple, shard_manifest(df.repartition(11), 4).collect()))
        assert a == b
        c = sorted(map(tuple, shard_manifest(df, 4, seed=99).collect()))
        assert a != c  # a different seed is a different permutation

    def test_validation(self, spark):
        import pytest as _pytest

        from n8n_tools_api_spark.operators.packing import shard_manifest

        with _pytest.raises(ValueError):
            shard_manifest(self._df(spark, 3), 0)
        with _pytest.raises(ValueError):
            shard_manifest(self._df(spark, 3), 2, mode="banana")


class TestDistributedPrefixSum:
    """token_pack/shard_manifest global layouts run the two-pass
    distributed prefix sum (round-5 review: the old
    Window.partitionBy() form funneled every row through ONE task)."""

    def test_global_window_is_pid_keyed(self, spark):
        from n8n_tools_api_spark.operators.packing import (
            shard_manifest, token_pack)
        df = spark.range(500).select(
            F.col("id").cast("string").alias("doc_id"),
            F.lit("a b c").alias("text"))
        for frame in (token_pack(df, 16), shard_manifest(df, 4)):
            plan = frame._jdf.queryExecution().executedPlan().toString()
            # the full-row window must key on the range-partition id …
            assert "windowspecdefinition(_pid" in plan
            # … and the only SinglePartition exchange feeds off the
            # K-row per-partition totals aggregate, never the data
            for chunk in plan.split("Exchange SinglePartition")[1:]:
                assert "HashAggregate(keys=[_pid" in chunk[:400]

    def test_matches_naive_single_window(self, spark):
        from pyspark.sql.window import Window as W
        from n8n_tools_api_spark.operators.packing import (
            token_pack, whitespace_token_count)
        df = spark.range(1000).select(
            F.col("id").cast("string").alias("doc_id"),
            F.concat(F.lit("w "), F.col("id").cast("string")).alias("text"))
        w = W.partitionBy().orderBy("doc_id") \
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        naive = df.select(
            "doc_id", whitespace_token_count(F.col("text")).alias("n")
        ).withColumn(
            "start", (F.sum(F.col("n") + 1).over(w) - (F.col("n") + 1))
            .cast("bigint"))
        got = {r.doc_id: r.start_offset for r in token_pack(df, 8).collect()}
        want = {r.doc_id: r.start for r in naive.collect()}
        assert got == want


class TestWriteTrainingShards:
    """Shard-file sink (packing.py::write_training_shards): content
    determinism, per-file order, manifest round-trip."""

    def _docs(self, spark, n=40):
        return spark.createDataFrame(
            [(f"d{i}", f"text of document {i}") for i in range(n)],
            "doc_id string, text string")

    def _read_shards(self, path):
        import json as _json
        import os

        out = {}
        for d in sorted(os.listdir(path)):
            if not d.startswith("shard="):
                continue
            k = int(d.split("=")[1])
            rows = []
            for f in sorted(os.listdir(os.path.join(path, d))):
                if f.startswith("part-") and f.endswith(".json"):
                    with open(os.path.join(path, d, f)) as fh:
                        rows += [_json.loads(l) for l in fh if l.strip()]
            out[k] = rows
        return out

    def test_files_hold_shards_in_position_order(self, spark, tmp_path):
        from n8n_tools_api_spark.operators.packing import (
            shard_manifest, write_training_shards)

        docs = self._docs(spark)
        path = str(tmp_path / "shards")
        man = {r.doc_id: (r.shard, r.pos_in_shard)
               for r in write_training_shards(docs, path, 4).collect()}
        want = {r.doc_id: (r.shard, r.pos_in_shard)
                for r in shard_manifest(docs, 4, mode="hashed").collect()}
        assert man == want
        shards = self._read_shards(path)
        assert sum(len(v) for v in shards.values()) == 40
        for k, rows in shards.items():
            assert [r["pos_in_shard"] for r in rows] == list(range(len(rows)))
            for r in rows:
                assert man[r["doc_id"]] == (k, r["pos_in_shard"])
                assert r["text"] == f"text of document {r['doc_id'][1:]}"

    def test_content_is_layout_invariant(self, spark, tmp_path):
        from n8n_tools_api_spark.operators.packing import (
            write_training_shards)

        docs = self._docs(spark)
        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        write_training_shards(docs.repartition(1), p1, 4)
        write_training_shards(docs.repartition(7), p2, 4)
        a, b = self._read_shards(p1), self._read_shards(p2)
        key = lambda rows: [(r["doc_id"], r["pos_in_shard"], r["text"])
                            for r in rows]
        assert {k: key(v) for k, v in a.items()} \
            == {k: key(v) for k, v in b.items()}

    def test_fmt_validation(self, spark, tmp_path):
        from n8n_tools_api_spark.operators.packing import (
            write_training_shards)

        with pytest.raises(ValueError):
            write_training_shards(self._docs(spark),
                                  str(tmp_path / "x"), 4, fmt="csv")
