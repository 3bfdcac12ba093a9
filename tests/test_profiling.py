"""Distribution profiling (op_profile_entropy) and robust cleaning
(op_winsorize_quantity): oracle parity plus pure-python recomputation."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from gravity_books_datalakehouse_spark.plans.advanced_queries import (
    op_profile_entropy,
    op_winsorize_quantity,
)
from gravity_books_datalakehouse_spark.plans.operator_queries import oracle_sql

from tests.conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle


def test_entropy_matches_oracle(spark, duck):
    assert_matches_oracle(
        op_profile_entropy(spark, SF_CORRECT),
        duck,
        oracle_sql()["op_profile_entropy"],
    )


def test_entropy_first_principles(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, source FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    got = {r.column_name: r for r in op_profile_entropy(spark, SF_SMOKE).collect()}
    for idx, name in [(0, "lang"), (1, "source")]:
        cnt = Counter(r[idx] for r in rows)
        n = sum(cnt.values())
        h = -sum((c / n) * math.log(c / n) for c in cnt.values())
        gini = 1 - sum((c / n) ** 2 for c in cnt.values())
        r = got[name]
        assert (r.n_rows, r.n_distinct) == (n, len(cnt))
        assert abs(r.entropy - round(h, 6)) <= 1e-6
        assert abs(r.norm_entropy - round(h / math.log(len(cnt)), 6)) <= 1e-6
        assert abs(r.gini_simpson - round(gini, 6)) <= 1e-6
        # bounds: 0 <= H <= ln k (normalized in [0, 1])
        assert 0.0 <= r.norm_entropy <= 1.0


def test_winsorize_matches_oracle(spark, duck):
    assert_matches_oracle(
        op_winsorize_quantity(spark, SF_CORRECT),
        duck,
        oracle_sql()["op_winsorize_quantity"],
    )


def test_winsorize_first_principles(spark):
    """Recompute thresholds with the cume_dist>=p rule, the clamped
    mean, and the clamp count in pure python per returnflag."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT l_returnflag, CAST(l_quantity AS BIGINT) "
        f"FROM read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    con.close()
    by_flag: dict[str, list[int]] = {}
    for f, q in rows:
        by_flag.setdefault(f, []).append(q)
    got = {r.l_returnflag: r for r in op_winsorize_quantity(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_flag)
    for f, qs in by_flag.items():
        qs.sort()
        n = len(qs)

        def pct(p):
            run = 0
            cnt = Counter(qs)
            for v in sorted(cnt):
                run += cnt[v]
                if run / n >= p:
                    return v
            raise AssertionError

        p05, p95 = pct(0.05), pct(0.95)
        clamped = [min(max(q, p05), p95) for q in qs]
        r = got[f]
        assert (r.p05_qty, r.p95_qty, r.n) == (p05, p95, n)
        assert abs(r.mean_qty - round(sum(qs) / n, 6)) <= 1e-6
        assert abs(r.mean_qty_winsorized - round(sum(clamped) / n, 6)) <= 1e-6
        assert r.n_clamped == sum(1 for q in qs if q < p05 or q > p95)
        # the clamp touches at most ~10% of rows by construction
        assert r.n_clamped <= 0.11 * n
        assert p05 <= r.mean_qty_winsorized <= p95


def test_winsorize_single_fact_scan(spark):
    """Thresholds AND clamped means both derive from ONE checkpointed
    histogram: the fact parquet is scanned only inside the checkpoint
    job, so the query plan itself must contain ZERO lineitem scans —
    both consumers read the metadata-sized ExistingRDD instead."""
    plan = (
        op_winsorize_quantity(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("lineitem.parquet") == 0
    assert plan.count("Scan ExistingRDD") >= 1


def test_quantile_normalize_matches_oracle(spark, duck):
    from gravity_books_datalakehouse_spark.plans.advanced_queries import (
        op_quantile_normalize_lengths,
    )

    assert_matches_oracle(
        op_quantile_normalize_lengths(spark, SF_CORRECT),
        duck,
        oracle_sql()["op_quantile_normalize_lengths"],
    )


def test_quantile_normalize_python_replay(spark):
    """Replay the integer mapping rule in python (within-source rank ->
    smallest pooled value whose cumulative count meets r*N/ns) and pin
    the defining property: sources of equal size map onto the SAME
    pooled multiset, so their mean_len_mapped values coincide."""
    from collections import defaultdict

    from gravity_books_datalakehouse_spark.plans.advanced_queries import (
        op_quantile_normalize_lengths,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, doc_id, n_chars "
        f"FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    pooled = sorted(v for _, _, v in rows)
    n_total = len(pooled)
    cum = []
    run = 0
    for v in sorted(set(pooled)):
        run += pooled.count(v)
        cum.append((v, run))
    by_src = defaultdict(list)
    for s, d, v in rows:
        by_src[s].append((v, d))
    want = {}
    for s, docs in by_src.items():
        docs.sort()
        ns = len(docs)
        mapped = []
        for r, (v, _) in enumerate(docs, start=1):
            mv = next(pv for pv, rc in cum if rc * ns >= r * n_total)
            mapped.append((v, mv))
        want[s] = (
            ns,
            round(sum(v for v, _ in mapped) / ns, 6),
            round(sum(m for _, m in mapped) / ns, 6),
            round(sum(abs(m - v) for v, m in mapped) / ns, 6),
        )
    got = {
        r.source: (
            r.n_docs,
            round(r.mean_len_raw, 6),
            round(r.mean_len_mapped, 6),
            round(r.mean_abs_shift, 6),
        )
        for r in op_quantile_normalize_lengths(spark, SF_SMOKE).collect()
    }
    assert got == want
    sizes = {v[0] for v in got.values()}
    if len(sizes) == 1:  # equal-size sources -> identical mapped multiset
        assert len({v[2] for v in got.values()}) == 1


def test_k_anonymity_python_replay(spark):
    """Recompute the QI histogram in pure python and demand identical
    unsafe-cell accounting."""
    import duckdb as _duckdb
    from collections import Counter
    import math

    import __spark_entry__ as m
    from gravity_books_datalakehouse_spark.plans.advanced_queries import (
        _KANON_K,
    )
    from tests.conftest import SF_CORRECT

    con = _duckdb.connect()
    rows = con.execute(
        "SELECT c_mktsegment, c_nationkey, c_acctbal FROM "
        f"read_parquet('{SF_CORRECT}/customer.parquet')"
    ).fetchall()
    con.close()
    cells = Counter(
        (seg, nat, math.floor(float(bal) / 1000.0)) for seg, nat, bal in rows
    )
    want = {}
    for (seg, _, _), k in cells.items():
        d = want.setdefault(seg, [0, 10**9, 0, 0])
        d[0] += 1
        d[1] = min(d[1], k)
        if k < _KANON_K:
            d[2] += 1
            d[3] += k
    got = {
        r.mktsegment: [r.n_cells, r.min_cell_size, r.n_unsafe_cells, r.n_exposed_rows]
        for r in m.queries()["op_k_anonymity"](spark, SF_CORRECT).collect()
    }
    assert got == want


def test_qnorm_binned_converges_to_exact(spark):
    """The binned large-domain variant approaches the exact mapping as B
    grows: mapped values stay within one bin width, and at B >= the
    value span the report equals the exact operator's."""
    # Import the exact operator DIRECTLY (not via the registry): round 8's
    # decorator-orphaning bug made the registry entry the binned variant,
    # which turned this test's "exact" leg self-referential. The registry
    # binding itself is pinned by tests/test_registry_invariants.py.
    from gravity_books_datalakehouse_spark.plans.advanced_queries import (
        op_quantile_normalize_lengths,
        quantile_normalize_binned,
    )
    from tests.conftest import SF_CORRECT

    exact = {
        r.source: (r.n_docs, r.mean_len_raw, r.mean_len_mapped)
        for r in op_quantile_normalize_lengths(spark, SF_CORRECT).collect()
    }
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    lo, hi = docs.agg(F.min("n_chars"), F.max("n_chars")).collect()[0]
    span = int(hi) - int(lo)
    # coarse: mapped mean within one bin width of the exact mapped mean
    coarse = {
        r.source: r.mean_len_mapped
        for r in quantile_normalize_binned(spark, SF_CORRECT, n_bins=64).collect()
    }
    width = span / 64
    for src, (_, _, exact_mapped) in exact.items():
        assert abs(coarse[src] - exact_mapped) <= width + 1
    # fine: one bin per distinct value -> identical report
    fine = {
        r.source: (r.n_docs, r.mean_len_raw, r.mean_len_mapped)
        for r in quantile_normalize_binned(
            spark, SF_CORRECT, n_bins=max(span, 1)
        ).collect()
    }
    for src in exact:
        assert fine[src][0] == exact[src][0]
        assert abs(fine[src][2] - exact[src][2]) <= 1.000001


def test_fd_audit_catches_planted_violation(spark):
    """The lineitem line-number FD must show real violations at sf0.1
    (TESTDATA's duplicate pairs); the three key->attribute FDs must be
    clean at every scale."""
    import __spark_entry__ as m

    rows = {
        r.fd: (r.n_groups, r.n_violating)
        for r in m.queries()["op_fd_violation_audit"](spark, SF_CORRECT).collect()
    }
    assert rows["orders_key_to_cust"][1] == 0
    assert rows["customer_key_to_nation"][1] == 0
    assert rows["part_key_to_brand"][1] == 0
    import duckdb as _duckdb

    con = _duckdb.connect()
    dup = con.execute(
        "SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber FROM "
        f"read_parquet('{SF_CORRECT}/lineitem.parquet') "
        "GROUP BY 1, 2 HAVING COUNT(DISTINCT l_partkey) > 1)"
    ).fetchone()[0]
    con.close()
    assert rows["lineitem_line_to_part"][1] == dup
