"""Date-dimension kit (F1–F4 + P6): calendar generation in one lazy plan.

Reference builds dim_date with eager pandas: ``pd.date_range(min, max,
freq='D')`` then ``.dt.strftime/.day/.month/.year/.quarter/.day_name/
.month_name`` (etl_script_dwh/etl_dwh.py:52-64,
etl_script_dlh/etl_lakehouse.py:100-110). Spark-first: a single
``sequence() + explode`` plan — the calendar never touches the driver.

Scale note: a calendar spanning centuries is still only ~10^5 rows, so the
date dim is always broadcast-joined against facts; generation cost is nil.
The ``sequence`` expression runs JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def date_dim_columns(full_date: Column) -> list[Column]:
    """The derived columns of dim_date, from a DATE column (F2–F4).

    English day/month names: Spark's ``date_format`` formats with an
    en-US locale by default, matching the reference's pandas
    ``day_name()/month_name()`` output ('Monday', 'January').
    """
    return [
        F.date_format(full_date, "yyyyMMdd").cast("int").alias("date_sk"),
        full_date.alias("full_date"),
        F.dayofmonth(full_date).alias("day_val"),
        F.month(full_date).alias("month_val"),
        F.year(full_date).alias("year_val"),
        F.quarter(full_date).alias("quarter_val"),
        F.date_format(full_date, "EEEE").alias("day_name"),
        F.date_format(full_date, "MMMM").alias("month_name"),
    ]


def date_dim_from_bounds(bounds: DataFrame, date_col: str) -> DataFrame:
    """dim_date spanning [min(date_col), max(date_col)] of ``bounds``.

    One lazy plan: global min/max agg (A2) → ``sequence`` (F1) → explode →
    derived columns. ``date_col`` may be DATE or TIMESTAMP; it is
    date-truncated first (P5).
    """
    d = F.col(date_col).cast("date")
    minmax = bounds.agg(F.min(d).alias("lo"), F.max(d).alias("hi"))
    days = minmax.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 day"))
        ).alias("full_date")
    )
    return days.select(*date_dim_columns(F.col("full_date")))


def build_date_dim(spark: SparkSession, start: str, end: str) -> DataFrame:
    """dim_date for a literal [start, end] ISO-date range."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)), F.to_date(F.lit(end)), F.expr("interval 1 day")
            )
        ).alias("full_date")
    )
    return days.select(*date_dim_columns(F.col("full_date")))
