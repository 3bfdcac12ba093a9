"""Pareto-frontier operator (op_skyline_suppliers).

Semantics pinned from first principles: the frontier must equal the
brute-force non-dominated set over the exact integer coordinates, and
exact metric ties must BOTH survive (dominance requires one strict
inequality)."""

from __future__ import annotations

import duckdb
from pyspark.sql import Window
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.advanced_queries import (
    _SKYLINE_SQL,
    op_skyline_suppliers,
)

from tests.conftest import SF_CORRECT, assert_matches_oracle


def test_skyline_matches_oracle(spark, duck):
    assert_matches_oracle(op_skyline_suppliers(spark, SF_CORRECT), duck, _SKYLINE_SQL)


def test_skyline_is_the_nondominated_set(spark):
    """Recompute the exact integer coordinates for every supplier in
    plain SQL, brute-force the dominance test in Python, and demand the
    operator returns exactly that set."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_CORRECT}/lineitem.parquet')"
    )
    coords = con.execute(
        """SELECT l_suppkey,
                  SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) *
                      (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS rev_u,
                  (SUM(CAST(floor(l_discount*100 + 0.5) AS BIGINT)) * 1000000)
                    // COUNT(*) AS d_u
           FROM lineitem GROUP BY 1"""
    ).fetchall()
    con.close()
    want = {
        k
        for k, r, d in coords
        if not any(
            (r2 >= r and d2 <= d and (r2 > r or d2 < d))
            for _, r2, d2 in coords
        )
    }
    got = {
        row.s_suppkey for row in op_skyline_suppliers(spark, SF_CORRECT).collect()
    }
    assert got == want
    assert len(got) >= 1


def test_skyline_keeps_exact_ties(spark):
    """Two points with identical (rev, d) don't dominate each other —
    both stay; a strictly better point on either axis removes the
    worse one. Runs the operator's exact window predicate on a
    synthetic frame where the cases are planted."""
    rows = [
        ("a", 100, 5),  # frontier (highest rev)
        ("b", 90, 5),   # dominated by a (same d, less rev)
        ("c", 90, 3),   # frontier
        ("d", 90, 3),   # exact tie with c -> BOTH stay
        ("e", 80, 3),   # dominated by c/d
        ("f", 70, 1),   # frontier
    ]
    df = spark.createDataFrame(rows, ["k", "rev_u", "d_u"])
    w_gt = Window.orderBy(F.col("rev_u").desc()).rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_eq = Window.partitionBy("rev_u")
    kept = {
        r.k
        for r in df.withColumn("m_gt", F.min("d_u").over(w_gt))
        .withColumn("m_eq", F.min("d_u").over(w_eq))
        .filter(
            (F.col("m_gt").isNull() | (F.col("m_gt") > F.col("d_u")))
            & (F.col("m_eq") == F.col("d_u"))
        )
        .collect()
    }
    assert kept == {"a", "c", "d", "f"}


def test_desc_range_frame_parity_with_duckdb(spark):
    """The 'strictly greater' RANGE frame (ORDER BY k DESC, UNBOUNDED
    PRECEDING .. 1 PRECEDING) must agree between engines — the frontier
    predicate rides on it."""
    rows = [(10, 5), (10, 3), (8, 7), (8, 2), (6, 9), (5, 1), (5, 8), (2, 4)]
    df = spark.createDataFrame(rows, ["rev", "d"])
    w = Window.orderBy(F.col("rev").desc()).rangeBetween(
        Window.unboundedPreceding, -1
    )
    got = [
        (r.rev, r.d, r.m)
        for r in df.withColumn("m", F.min("d").over(w))
        .orderBy(F.desc("rev"), "d")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(rev INT, d INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        """SELECT rev, d, MIN(d) OVER (ORDER BY rev DESC
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           FROM t ORDER BY rev DESC, d"""
    ).fetchall()
    con.close()
    assert got == [tuple(w_) for w_ in want]
