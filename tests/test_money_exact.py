"""Exactness proofs for the integer-cents money fast path.

_cents / _money_sum (plans/operator_queries.py) replace per-row
DECIMAL(18,2) arithmetic with primitive long math in whole-stage codegen.
These tests pin the three claims the helpers' docstrings make:

1. _cents recovers the exact integer subunit value for ANY 2-dp double,
   either sign (floor(x*100 + 0.5) nearest-integer identity).
2. _money_sum(units, scale).cast(double) is BIT-identical to the decimal
   reference F.sum(decimal-cast).cast(double) — including negative
   values (c_acctbal) and the scale-4/6 product units.
3. The hi/lo split-sum recombine is the exact identity
   units == (units >> 20) * 2^20 + (units & 0xFFFFF) for negatives.

Plus the plan-level claim of _day_lt: the day-boundary filter reaches
the Parquet scan as a pushed filter — in both the explicit form and
(via UnwrapCastInBinaryComparison) the date-cast form it replaces.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import (
    _cents,
    _day_lt,
    _money,
    _money_sum,
)


def _random_2dp(rng, lo_cents, hi_cents, n):
    return [rng.randint(lo_cents, hi_cents) / 100.0 for _ in range(n)]


def test_cents_exact_for_signed_2dp_values(spark):
    rng = random.Random(7)
    vals = (
        _random_2dp(rng, -99999, 99999, 300)
        + [0.0, -0.01, 0.01, 0.07, -0.07, 104999.91, -104999.91, 0.5, -0.5]
    )
    df = spark.createDataFrame([Row(x=v) for v in vals])
    got = [r.c for r in df.select(_cents("x").alias("c")).collect()]
    want = [round(v * 100) for v in vals]
    assert got == want


def test_money_sum_bit_identical_to_decimal_reference(spark):
    rng = random.Random(11)
    # signed cents (acctbal-like) and large positive prices
    vals = _random_2dp(rng, -99999, 99999, 2000) + _random_2dp(
        rng, 90068, 10499991, 2000
    )
    df = spark.createDataFrame([Row(x=v) for v in vals]).repartition(7)
    fast = df.agg(_money_sum(_cents("x"), 2).cast("double").alias("s")).collect()[0].s
    ref = df.agg(F.sum(_money("x")).cast("double").alias("s")).collect()[0].s
    assert math.isclose(fast, ref, rel_tol=0.0, abs_tol=0.0)  # bitwise


def test_money_sum_scale4_product_units(spark):
    rng = random.Random(13)
    rows = [
        Row(p=rng.randint(90068, 10499991) / 100.0, d=rng.randint(0, 10) / 100.0)
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows).repartition(5)
    units = _cents("p") * (F.lit(100) - _cents("d"))
    fast = df.agg(_money_sum(units, 4).cast("double").alias("s")).collect()[0].s
    dec = (
        (F.col("p").cast("decimal(18,2)") * (F.lit(1).cast("decimal(18,2)")
         - F.col("d").cast("decimal(18,2)"))).cast("decimal(18,4)")
    )
    ref = df.agg(F.sum(dec).cast("double").alias("s")).collect()[0].s
    assert fast == ref


def test_hilo_split_identity_for_negative_units(spark):
    vals = [-1, -(1 << 20) - 3, -123456789, 123456789, 0, (1 << 40) + 17]
    df = spark.createDataFrame([Row(u=v) for v in vals])
    out = df.select(
        (
            F.shiftright(F.col("u"), 20) * F.lit(1 << 20)
            + F.col("u").bitwiseAND(F.lit((1 << 20) - 1))
        ).alias("re"),
        "u",
    ).collect()
    for r in out:
        assert r.re == r.u


def test_day_lt_filter_is_pushed_to_parquet_scan(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .filter(_day_lt("l_shipdate", "1998-09-03"))
        .groupBy("l_returnflag")
        .count()
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # Spark 4's UnwrapCastInBinaryComparison pushes the date-cast form
    # too (the _day_lt docstring documents this); pin that equivalence
    # so a regression in either form is visible.
    cast_form = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag")
        .count()
    )
    cast_plan = cast_form._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in cast_plan


def test_day_lt_equivalent_to_date_cast_filter(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    n_fast = li.filter(_day_lt("l_shipdate", "1996-01-01")).count()
    n_ref = li.filter(
        F.col("l_shipdate").cast("date") <= F.lit("1995-12-31").cast("date")
    ).count()
    assert n_fast == n_ref
