"""A9/O3 health-score model (error_metrics.py:421-520, ocr.py:225).

The full DuckDB replay lives in the lineage_health oracle
(test_queries_oracle.py); these pin the semantic edges: status tiers on
the UNROUNDED score, the fixed recommendation order + top-3 slice, the
normal-operation fallback, and the lineage-table adapter.
"""

from n8n_tools_api_spark.operators.health import (
    REC_AUTH_FAILURES,
    REC_CRITICAL_SCORE,
    REC_HIGH_ERROR_RATE,
    REC_LOW_VOLUME,
    REC_NORMAL,
    REC_SLOW_PROCESSING,
    health_from_lineage,
    health_rollup,
)

SCHEMA = "svc_group int, error_code string, processing_time_ms double"


def _one(spark, rows):
    out = health_rollup(spark.createDataFrame(rows, SCHEMA)).collect()
    assert len(out) == 1
    return out[0]


class TestHealthRollup:
    def test_rounded_vs_unrounded_boundary(self, spark):
        # engineer health = 74.96…: rounds to 75.0 yet status is 'fair'
        # ers=100 (no errors), vs=6 (3 requests): need 0.3*ls = 23.76
        # → ls = 79.2 → avg_ms = 2080 exactly
        rows = [(1, None, 2080.0), (1, None, 2080.0), (1, None, 2080.0)]
        r = _one(spark, rows)
        h = 100 * 0.5 + (100 - 2080.0 / 100) * 0.3 + 6.0 * 0.2  # 74.96
        assert abs(h - 74.96) < 1e-9
        assert r["health_score"] == 75.0 and r["status"] == "fair"

    def test_recommendation_order_and_top3_slice(self, spark):
        # all six conditions true → only the first three survive the
        # route's [:3] slice (ocr.py:225); auth/file-size are cut
        rows = [
            (1, "API_AUTHENTICATION_FAILED", 40000.0),
            (1, "FILE_TOO_LARGE", 40000.0),
            (1, None, 40000.0),
        ]
        r = _one(spark, rows)
        assert (r["rec_1"], r["rec_2"], r["rec_3"]) == (
            REC_HIGH_ERROR_RATE, REC_SLOW_PROCESSING, REC_LOW_VOLUME)
        assert r["status"] == "critical"

    def test_critical_score_rec_precedes_code_specific(self, spark):
        # healthy latency/volume but high error rate with auth errors:
        # order is [high error, critical score, auth] per the
        # reference's emission order (error_metrics.py:464-479)
        rows = ([(1, "API_AUTHENTICATION_FAILED", 100.0)] * 4
                + [(1, None, 100.0)] * 8)
        r = _one(spark, rows)
        assert (r["rec_1"], r["rec_2"], r["rec_3"]) == (
            REC_HIGH_ERROR_RATE, REC_CRITICAL_SCORE, REC_AUTH_FAILURES)

    def test_normal_operation_fallback(self, spark):
        rows = [(1, None, 1000.0) for _ in range(60)]
        r = _one(spark, rows)
        # ers=100, ls=90, vs=100 → health 97.0
        assert r["status"] == "excellent" and r["health_score"] == 97.0
        assert (r["rec_1"], r["rec_2"], r["rec_3"]) == (REC_NORMAL, None, None)
        assert r["error_rate"] == 0.0 and r["success_rate"] == 1.0

    def test_component_weights_and_rates(self, spark):
        # 1 error / 4 requests: ers = 100 - 0.25*500 = 0 (clamped via
        # the raw -25), avg = 2000 → ls = 80, vs = 8
        rows = [(1, "PROCESSING_FAILED", 2000.0)] + [(1, None, 2000.0)] * 3
        r = _one(spark, rows)
        assert r["error_rate_score"] == 0.0
        assert r["latency_score"] == 80.0
        assert r["volume_score"] == 8.0
        assert r["health_score"] == round(0 * 0.5 + 80 * 0.3 + 8 * 0.2, 1)
        assert r["error_rate"] == 0.25 and r["avg_processing_time_ms"] == 2000.0


class TestHealthFromLineage:
    def test_empty_bucket_counts_as_error(self, spark):
        lineage = spark.createDataFrame(
            [("run_a", 0, 100, 5, 7, 1200),
             ("run_a", 1, 0, 0, 0, 900),
             ("run_a", 2, 80, 4, 2, 1500)],
            "run_id string, bucket int, doc_count bigint, span_count bigint,"
            " media_ref_count bigint, wall_ms bigint",
        )
        r = health_from_lineage(lineage).collect()
        assert len(r) == 1 and r[0]["run_id"] == "run_a"
        assert r[0]["total_requests"] == 3 and r[0]["total_errors"] == 1
        assert r[0]["avg_processing_time_ms"] == 1200.0
