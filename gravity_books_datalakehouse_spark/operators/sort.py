"""Sorts / limits / top-k (O1–O5, SURVEY.md §2.5).

Every reference query carries a total ORDER BY with deterministic
tiebreakers (test_queries/test_queries.py:25,35,47,57,66) because its
harness compares order-sensitively. We preserve the tiebreakers.

Scale: ``orderBy(...).limit(k)`` is planned as TakeOrderedAndProject —
each partition keeps only its local top-k and the driver merges k·P rows,
never a global sort. A full ORDER BY without limit is a range-partitioned
sort (sampling + exchange); keep those for final small outputs only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """O2/O3 — true top-k: ``orderBy(*order).limit(k)``.

    Pass fully-tiebroken ``order`` columns (e.g. ``[desc("cnt"),
    asc("title")]``) so the selected k rows are deterministic.
    """
    return df.orderBy(*order).limit(k)


def bounded_sort(df: DataFrame, *order: Column | str) -> DataFrame:
    """Total ordering for a DIM-BOUNDED result — output cardinality
    capped by attribute domains (nations, priorities, year-months,
    brand×type×size combos), NOT proportional to the fact size.

    ``coalesce(1).sortWithinPartitions(*order)`` returns the identical
    rows in the identical order as a global ``orderBy``, but as one
    local sort task over the already-aggregated output — no
    RangePartitioning exchange and no separate sampling job, which at
    sf0.1 cost ~0.1 s and 2-3 scheduled stages per query (round-7
    measurement; the q_ family's answers are 2-700 rows). At any SF the
    coalesced input is the same domain-bounded row set, so the single
    task never grows with data. Do NOT use for fact-proportional
    outputs — those keep the distributed range sort."""
    return df.coalesce(1).sortWithinPartitions(*order)


def global_rank(df: DataFrame, order: Sequence[Column], rank_name: str) -> DataFrame:
    """Distributed 1-based dense global rank with ``row_number() OVER
    (ORDER BY order)`` semantics but NO single-partition window: range-
    repartition on the sort expressions (partition i's rows all precede
    partition i+1's), local row_number per partition, plus broadcast
    per-partition offsets. The only unpartitioned window runs over the
    P-row partition-counts table (metadata, not data).

    ``order`` must be fully tiebroken or ranks within ties are
    partition-layout-dependent. Same construction as the ``dense``
    surrogate-key strategy (surrogate_keys.py), generalized to arbitrary
    sort expressions including ``desc()``.
    """
    ordered = df.repartitionByRange(*order).withColumn(
        "__pid", F.spark_partition_id()
    )
    counts = ordered.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    w_local = Window.partitionBy("__pid").orderBy(*order)
    return (
        ordered.withColumn("__rn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(rank_name, (F.col("__off") + F.col("__rn")).cast("bigint"))
        .drop("__pid", "__rn", "__off")
    )


def distributed_ntile(
    df: DataFrame, order: Sequence[Column], n: int, tile_name: str
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order)`` without funneling the
    table through one task: global_rank() above, then the closed-form
    tile from (rank, N) — ntile gives the first N % n tiles ceil(N/n)
    rows and the rest floor(N/n). N arrives as a broadcast one-row
    aggregate (a scalar join, not a driver collect).
    """
    ranked = global_rank(df, order, "__rank")
    total = ranked.agg(F.count(F.lit(1)).alias("__n"))
    q = (F.col("__n") / n).cast("bigint")  # floor tile size
    r = F.col("__n") % n  # tiles that get one extra row
    rn0 = F.col("__rank") - 1
    big_span = r * (q + 1)
    tile = (
        F.when(rn0 < big_span, F.floor(rn0 / (q + 1)))
        .otherwise(r + F.floor((rn0 - big_span) / F.greatest(q, F.lit(1))))
        + 1
    )
    return (
        ranked.join(F.broadcast(total))
        .withColumn(tile_name, tile.cast("int"))
        .drop("__rank", "__n")
    )
