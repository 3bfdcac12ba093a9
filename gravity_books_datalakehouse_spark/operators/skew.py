"""Skew mitigation: salted joins and explicit repartitioning.

The reference never faces skew (single-process pandas); at 100 TB a hot
join key (one customer with 10% of all orders) turns a shuffle join into
one straggler task. Two levers, in preference order:

1. **AQE skew-join** (on by default in session.py): splits oversized
   partitions at runtime. Zero code. Use it first.
2. **Salting** (this module): for skew AQE can't fix — e.g. a hot key on
   the *build* side of an aggregation, or pre-AQE Spark — explode the
   dimension side into N salted replicas and scatter the fact side across
   them; the hot key's rows spread over N tasks.

``salted_join`` keeps the API declarative: it rewrites join keys, Catalyst
still owns the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with ``salt_buckets``-way salting.

    Fact rows get a content-derived salt (xxhash64 over all fact columns,
    modulo buckets — deterministic, so stable across task retries and
    speculative execution, unlike rand()/monotonically_increasing_id);
    the dim side is exploded ×salt_buckets so every (key, salt) probe
    finds its match. Dim replication costs salt_buckets× its size — use
    for small-to-medium dims under a skewed fact, never dim×dim.

    Only ``inner`` and ``left`` joins are supported: under right/full
    outer, every unmatched dim row would surface once per salt replica
    (salt_buckets duplicates with null fact columns). For a skewed
    right/full outer, swap the sides (left) or fall back to AQE skew-join.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: "
            "outer joins would duplicate unmatched dim rows per salt replica"
        )
    salt = F.abs(F.xxhash64(*[F.col(c) for c in fact.columns])) % salt_buckets
    f = fact.withColumn("__salt", salt.cast("int"))
    d = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")


def repartition_for_join(df: DataFrame, key: str, num_partitions: int) -> DataFrame:
    """Pre-shuffle a table on its join key (pairs with an identically
    partitioned other side to make the join exchange-free — poor man's
    bucketing when the sink isn't a bucketed table)."""
    return df.repartition(num_partitions, F.col(key))
