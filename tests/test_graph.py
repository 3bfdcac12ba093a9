"""PageRank over the co-purchase graph (operators/graph.py): oracle
parity plus the mass-conservation invariants the hash can't articulate."""

from __future__ import annotations

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators.graph import (
    DAMPING,
    copurchase_edges,
    pagerank,
)
from tests.conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle


def _registry():
    import __spark_entry__ as m

    return m.queries(), m.oracle_sql()


def test_pagerank_matches_oracle(spark, duck):
    qs, osql = _registry()
    assert_matches_oracle(
        qs["op_graph_pagerank"](spark, SF_CORRECT),
        duck,
        osql["op_graph_pagerank"],
    )


def test_pagerank_mass_conservation(spark):
    """On the symmetrized dangling-free graph the rank vector stays a
    probability distribution: sum == 1 every sweep (up to float drift),
    and every node holds at least the teleport floor (1-d)/N."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    ranks = pagerank(copurchase_edges(li)).collect()
    n = len(ranks)
    assert n > 0
    total = sum(r.r for r in ranks)
    assert abs(total - 1.0) < 1e-9
    floor = (1.0 - DAMPING) / n
    assert all(r.r >= floor - 1e-12 for r in ranks)
    # degree column is the true adjacency degree
    deg = {
        r.src: r.n
        for r in copurchase_edges(li)
        .groupBy("src")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert all(r.degree == deg[r.node] for r in ranks)


def test_pagerank_favors_central_hub(spark):
    """A star (hub connected to k spokes, spokes only to the hub) must
    rank the hub strictly above every spoke — centrality, not a degree
    echo of the input row counts."""
    edges = spark.createDataFrame(
        [(0, v) for v in range(1, 6)] + [(v, 0) for v in range(1, 6)],
        "src int, dst int",
    )
    got = {r.node: r.r for r in pagerank(edges).collect()}
    hub, spokes = got[0], [got[v] for v in range(1, 6)]
    assert all(hub > s for s in spokes)
    # spokes are symmetric: identical ranks bit-for-bit
    assert len({repr(s) for s in spokes}) == 1


def test_triangles_matches_oracle(spark, duck):
    qs, osql = _registry()
    assert_matches_oracle(
        qs["op_graph_triangles"](spark, SF_CORRECT),
        duck,
        osql["op_graph_triangles"],
    )


def test_triangles_brute_force(spark):
    """Triangle counts and clustering coefficients against a pure-python
    recount of the same graph at smoke scale."""
    from itertools import combinations

    from gravity_books_datalakehouse_spark.operators.graph import (
        copurchase_edges,
    )

    qs, _ = _registry()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    und = {
        (r.src, r.dst)
        for r in copurchase_edges(li).collect()
        if r.src < r.dst
    }
    adj: dict[int, set] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri_per_node: dict[int, int] = {}
    for u, v in und:
        for w in adj[u] & adj[v]:
            if v < w:  # u<v<w counted once
                for n in (u, v, w):
                    tri_per_node[n] = tri_per_node.get(n, 0) + 1
    rows = qs["op_graph_triangles"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    want_order = sorted(
        tri_per_node.items(), key=lambda kv: (-kv[1], kv[0])
    )[: len(rows)]
    assert [(r.part_key, r.triangles) for r in rows] == want_order
    for r in rows:
        d = len(adj[r.part_key])
        assert r.degree == d
        assert abs(r.clustering_coeff - 2 * r.triangles / (d * (d - 1))) == 0.0


def test_pagerank_plan_stays_bounded(spark):
    """Each sweep ends in localCheckpoint, so the final plan must be
    sweep-count-independent (the unrolled-loop lineage lesson:
    sim_mmr_rerank went ~5400 plan nodes without truncation)."""
    qs, _ = _registry()
    plan = str(
        qs["op_graph_pagerank"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .optimizedPlan()
    )
    assert len(plan.splitlines()) < 60


def test_labelprop_matches_oracle(spark, duck):
    from gravity_books_datalakehouse_spark.operators.graph import (
        _LABELPROP_SQL,
        op_graph_label_prop,
    )

    assert_matches_oracle(
        op_graph_label_prop(spark, SF_CORRECT), duck, _LABELPROP_SQL
    )


def test_labelprop_pure_python_recount(spark):
    """Replay the synchronous 4-sweep LPA in plain python over the same
    co-purchase edges and demand the identical community partition —
    the update is pure integer argmax (count desc, label asc), so the
    match is exact, no tolerance."""
    from collections import Counter, defaultdict

    from gravity_books_datalakehouse_spark.operators.graph import (
        LP_SWEEPS,
        copurchase_edges,
        op_graph_label_prop,
    )
    from gravity_books_datalakehouse_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    edges = [
        (r.src, r.dst) for r in copurchase_edges(li).collect()
    ]
    nbrs = defaultdict(list)
    for s, d in edges:
        nbrs[d].append(s)
    lab = {v: v for v in nbrs}
    for _ in range(LP_SWEEPS):
        new = {}
        for v, ns in nbrs.items():
            cnt = Counter(lab[u] for u in ns)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    want = Counter(lab.values())
    got_rows = op_graph_label_prop(spark, SF_SMOKE).collect()
    got = {r.community: r.n_members for r in got_rows}
    assert got == dict(want)
    # communities partition the node set
    assert sum(got.values()) == len(nbrs)
    # per-community id range is consistent
    mins = defaultdict(set)
    for v, l in lab.items():
        mins[l].add(v)
    for r in got_rows:
        assert r.min_part == min(mins[r.community])
        assert r.max_part == max(mins[r.community])


# --------------------------------------------------------------------------
# k-core (op_graph_kcore)


def test_kcore_matches_oracle(spark, duck):
    qs, osql = _registry()
    assert_matches_oracle(
        qs["op_graph_kcore"](spark, SF_CORRECT),
        duck,
        osql["op_graph_kcore"],
    )


def test_kcore_peels_pendant_chain(spark):
    """A triangle with a pendant chain hanging off it: the chain peels
    away sweep by sweep (cascade, not a one-shot degree filter) and
    only the triangle survives k=2 peeling, each member at residual
    degree 2."""
    from gravity_books_datalakehouse_spark.operators.graph import kcore_peel

    # triangle 0-1-2, chain 2-3-4-5
    und = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src int, dst int"
    )
    got = {r.node: r.core_degree for r in kcore_peel(edges, k=2, n_sweeps=4).collect()}
    assert got == {0: 2, 1: 2, 2: 2}
    # one sweep removes only node 5's edges; 4 still sees degree 1 later:
    # after a single sweep the chain is NOT fully gone (cascade needed)
    one = {r.node for r in kcore_peel(edges, k=2, n_sweeps=1).collect()}
    assert {0, 1, 2}.issubset(one) and 4 in one and 5 not in one


def test_kcore_degree_invariant(spark):
    """Every surviving node's residual degree is >= k and <= its full
    degree on the real corpus."""
    from gravity_books_datalakehouse_spark.operators.graph import (
        KCORE_K,
        copurchase_edges,
        kcore_peel,
    )

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    edges = copurchase_edges(li)
    full = {
        r.src: r.n
        for r in edges.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    core = kcore_peel(edges).collect()
    assert len(core) > 0
    for r in core:
        assert KCORE_K <= r.core_degree <= full[r.node]
