"""Property-based tests (hypothesis): operator semantics vs Python oracles
on randomized small inputs. Few examples per property — each example is a
Spark job — but randomized inputs catch edge shapes fixed fixtures miss
(empty groups, duplicate keys, single-element arrays, ties)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators.aggregates import (
    group_concat_sorted,
)
from gravity_books_datalakehouse_spark.operators.skew import salted_join
from gravity_books_datalakehouse_spark.operators.sort import top_k
from gravity_books_datalakehouse_spark.operators.surrogate_keys import (
    add_surrogate_key,
)

_SETTINGS = dict(max_examples=8, deadline=None)

keys = st.integers(min_value=0, max_value=4)
words = st.text(alphabet="abcxyz", min_size=1, max_size=4)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(keys, words), min_size=1, max_size=30))
def test_group_concat_matches_python(spark, rows):
    df = spark.createDataFrame(rows, "k int, v string")
    got = {r.k: r.v for r in group_concat_sorted(df, ["k"], "v").collect()}
    want = {}
    for k, v in rows:
        want.setdefault(k, []).append(v)
    want = {k: ", ".join(sorted(vs)) for k, vs in want.items()}
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(st.tuples(keys, st.integers(-100, 100)), min_size=1, max_size=30))
def test_top_k_matches_python(spark, rows):
    df = spark.createDataFrame(rows, "k int, score int")
    got = [(r.k, r.score) for r in
           top_k(df, [F.desc("score"), F.asc("k")], 3).collect()]
    want = sorted(rows, key=lambda t: (-t[1], t[0]))[:3]
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(words, min_size=1, max_size=20, unique=True))
def test_surrogate_keys_dense_and_ordered(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    out = sorted((r.sk, r.k) for r in add_surrogate_key(df, "k", "sk").collect())
    assert [sk for sk, _ in out] == list(range(1, len(vals) + 1))
    assert [k for _, k in out] == sorted(vals)


@settings(**_SETTINGS)
@given(
    st.lists(st.tuples(keys, st.integers(0, 9)), min_size=1, max_size=40),
    st.lists(keys, min_size=1, max_size=5, unique=True),
)
def test_salted_join_equals_plain_join(spark, fact_rows, dim_keys):
    fact = spark.createDataFrame(fact_rows, "k int, v int")
    dim = spark.createDataFrame([(k, f"d{k}") for k in dim_keys], "k int, lbl string")
    plain = sorted(map(tuple, fact.join(dim, "k").select("k", "v", "lbl").collect()))
    salted = sorted(map(tuple, salted_join(fact, dim, "k").select("k", "v", "lbl").collect()))
    assert plain == salted
