"""Corpus expectation checking — the data-validation gate production
pipelines run between curation and training (the "unit tests for
data" pattern: AWS Deequ / Great Expectations; Dolma ships per-shard
attribute checks, and every released-dataset card implies a suite of
these): declare constraints, compute every metric in ONE aggregation
pass, emit one verdict row per constraint.

Constraint forms (``(kind, column, threshold)`` tuples):

* ``("row_count_min", None, n)`` — at least ``n`` rows;
* ``("completeness_min", col, frac)`` — non-NULL fraction of ``col``
  is at least ``frac``;
* ``("uniqueness", col, None)`` — ``col`` values are globally unique
  (distinct count equals row count; NULLs count as missing, so a
  column with NULLs cannot be fully unique unless they are absent);
* ``("min_value", col, v)`` / ``("max_value", col, v)`` — the
  column's min is at least / max is at most ``v`` (numeric).

Pinned semantics (replayed exactly by the ``corpus_expectations``
oracle):

* every metric is a double derived from exact BIGINT counts (or the
  column min/max cast to double); fraction metrics divide two exact
  counts — IEEE-correctly-rounded on both engines, so the replay is
  bit-exact, like the DSIR weight arithmetic;
* uniqueness passes iff ``distinct/total`` equals exactly 1.0 (two
  equal BIGINTs divide to exactly 1.0 — no epsilon needed);
* an EMPTY corpus yields NULL metrics for per-column constraints and
  every constraint fails except a ``row_count_min`` of 0 — a
  validation suite must fail loudly on an empty input, not pass
  vacuously;
* output is one row per constraint in the caller's declaration order
  (``check_id`` preserves it).

Scale shape: ONE aggregation over the corpus computes every needed
count/min/max (map-side combined, one reduce row). ``uniqueness``
uses exact ``count_distinct`` — at 10^12 rows swap in
``approx_count_distinct`` upstream if the exactness isn't worth the
distinct aggregation's expand; the constraint evaluation itself is a
literal unpivot of the single metrics row, costing nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_KINDS = ("row_count_min", "completeness_min", "uniqueness",
          "min_value", "max_value")


def corpus_expectations(docs: DataFrame,
                        constraints: list[tuple[str, str | None, float | None]],
                        ) -> DataFrame:
    """Evaluate ``constraints`` against ``docs`` (see module docstring).

    Output: (check_id, constraint, column, metric, threshold, passed)
    — one row per constraint, declaration order.
    """
    if not constraints:
        raise ValueError("constraints must be a non-empty list")
    for kind, col, thr in constraints:
        if kind not in _KINDS:
            raise ValueError(f"unknown constraint kind {kind!r}")
        if kind == "row_count_min":
            if col is not None:
                raise ValueError("row_count_min takes no column")
        elif col is None:
            raise ValueError(f"{kind} requires a column")
        if kind == "uniqueness":
            if thr is not None:
                raise ValueError("uniqueness takes no threshold")
        elif thr is None:
            raise ValueError(f"{kind} requires a threshold")

    aggs = [F.count(F.lit(1)).cast("bigint").alias("_total")]
    seen: set[str] = set()
    for kind, col, _thr in constraints:
        if col is None:
            continue
        if ("nn", col) not in seen and kind in ("completeness_min",
                                                "uniqueness"):
            seen.add(("nn", col))
            aggs.append(F.count(F.col(col)).cast("bigint")
                        .alias(f"_nn_{col}"))
        if ("dc", col) not in seen and kind == "uniqueness":
            seen.add(("dc", col))
            aggs.append(F.count_distinct(F.col(col)).cast("bigint")
                        .alias(f"_dc_{col}"))
        if ("mn", col) not in seen and kind == "min_value":
            seen.add(("mn", col))
            aggs.append(F.min(F.col(col)).cast("double")
                        .alias(f"_mn_{col}"))
        if ("mx", col) not in seen and kind == "max_value":
            seen.add(("mx", col))
            aggs.append(F.max(F.col(col)).cast("double")
                        .alias(f"_mx_{col}"))
    metrics = docs.agg(*aggs)

    total = F.col("_total")
    nonempty = total > 0
    rows = []
    for i, (kind, col, thr) in enumerate(constraints):
        if kind == "row_count_min":
            metric = total.cast("double")
            passed = metric >= F.lit(float(thr))
            thr_col = F.lit(float(thr))
        elif kind == "completeness_min":
            metric = F.when(nonempty, F.col(f"_nn_{col}").cast("double")
                            / total.cast("double"))
            passed = F.coalesce(metric >= F.lit(float(thr)), F.lit(False))
            thr_col = F.lit(float(thr))
        elif kind == "uniqueness":
            metric = F.when(nonempty, F.col(f"_dc_{col}").cast("double")
                            / total.cast("double"))
            passed = F.coalesce(metric == F.lit(1.0), F.lit(False))
            thr_col = F.lit(1.0)
        elif kind == "min_value":
            metric = F.when(nonempty, F.col(f"_mn_{col}"))
            passed = F.coalesce(metric >= F.lit(float(thr)), F.lit(False))
            thr_col = F.lit(float(thr))
        else:  # max_value
            metric = F.when(nonempty, F.col(f"_mx_{col}"))
            passed = F.coalesce(metric <= F.lit(float(thr)), F.lit(False))
            thr_col = F.lit(float(thr))
        rows.append(F.struct(
            F.lit(i).cast("bigint").alias("check_id"),
            F.lit(kind).alias("constraint"),
            F.lit(col).cast("string").alias("column"),
            metric.cast("double").alias("metric"),
            thr_col.cast("double").alias("threshold"),
            passed.alias("passed"),
        ))
    return (metrics.select(F.explode(F.array(*rows)).alias("_c"))
            .select("_c.*"))
