"""Exact-boundary session semantics: Spark ``session_window`` vs the
oracle's ``lag(ts) > gap`` break rule.

A 30-minute-gap sessionization has one ambiguous input: a gap of
EXACTLY 30 minutes. Spark's per-event window is [ts, ts+gap) with an
exclusive end, but overlapping-or-TOUCHING windows coalesce, so the
exact-boundary gap MERGES — the same outcome as the SQL break rule
``lag(ts) > INTERVAL '30 minutes'`` (30 > 30 is false). These tests pin
that equivalence on synthetic boundary data so a Spark version change
flipping the coalesce rule fails loudly instead of surfacing as a
cross-engine hash mismatch in ev_sessionize / ev_peak_concurrency /
op_j_interval_overlap / ev_pattern_match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

GAP = "30 minutes"


def _sessions(spark, ts_strings):
    df = spark.createDataFrame(
        [("u", t) for t in ts_strings], "user_id string, ts_s string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    return (
        df.groupBy(F.session_window("ts", GAP).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )


def _oracle_sessions(duck, ts_strings):
    vals = ", ".join(f"(TIMESTAMP '{t}')" for t in ts_strings)
    return duck.execute(
        f"""WITH e(ts) AS (VALUES {vals}),
            n AS (SELECT ts, SUM(CASE WHEN prev IS NULL
                           OR ts - prev > INTERVAL '30 minutes'
                      THEN 1 ELSE 0 END) OVER (ORDER BY ts) AS sid
                  FROM (SELECT ts, lag(ts) OVER (ORDER BY ts) AS prev FROM e))
            SELECT sid, COUNT(*) FROM n GROUP BY sid ORDER BY sid"""
    ).fetchall()


def test_exact_gap_merges_in_both_engines(spark, duck):
    ts = ["2024-01-01 10:00:00", "2024-01-01 10:30:00"]
    assert len(_sessions(spark, ts)) == 1
    assert len(_oracle_sessions(duck, ts)) == 1


def test_gap_one_microsecond_over_splits_in_both_engines(spark, duck):
    ts = ["2024-01-01 10:00:00", "2024-01-01 10:30:00.000001"]
    assert len(_sessions(spark, ts)) == 2
    assert len(_oracle_sessions(duck, ts)) == 2


def test_chained_boundary_gaps_form_one_session(spark, duck):
    # transitive merge: each consecutive gap is exactly 30 minutes
    ts = [
        "2024-01-01 10:00:00",
        "2024-01-01 10:30:00",
        "2024-01-01 11:00:00",
    ]
    spark_s = _sessions(spark, ts)
    assert len(spark_s) == 1 and spark_s[0].n == 3
    assert _oracle_sessions(duck, ts) == [(1, 3)]
