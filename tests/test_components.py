"""Connected components: known graphs + union-find oracle on real pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators.components import (
    connected_components,
    dedup_clusters,
)
from tests.conftest import SF_SMOKE


def test_components_on_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11} (pair), 20 isolated-by-self-loop
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)], "src long, dst long"
    )
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_components_long_chain_converges_in_log_rounds(spark):
    """A diameter-2000 chain must converge within ~log^2 rounds — the
    large-star/small-star guarantee. Per-round min-label propagation
    (O(diameter) rounds) cannot pass this with max_iter=15."""
    n = 2000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    got = {r.id: r.component
           for r in connected_components(edges, max_iter=15).collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_components_two_cliques_bridged(spark):
    """Dense clusters joined by one bridge edge — the shape LSH dedup
    produces; also exercises the clique duplicate-edge path."""
    k = 30
    c1 = [(i, j) for i in range(k) for j in range(i + 1, k)]
    c2 = [(100 + i, 100 + j) for i in range(k) for j in range(i + 1, k)]
    edges = spark.createDataFrame(
        c1 + c2 + [(k - 1, 100)], "src long, dst long"
    )
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 2 * k


def test_dedup_clusters_match_union_find(spark):
    from gravity_books_datalakehouse_spark.operators.dedup import (
        dedup_minhash_lsh_pairs,
    )

    pairs_df = dedup_minhash_lsh_pairs(spark, SF_SMOKE)
    pairs = [(r.doc_a, r.doc_b) for r in pairs_df.collect()]
    got = {r.doc_id: r.cluster_rep for r in dedup_clusters(pairs_df).collect()}

    # local union-find oracle
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in pairs:
        union(a, b)
    want = {x: find(x) for x in parent}
    assert got == want


def test_cherry_graph_converges_to_one_component(spark):
    """Round-10 regression: the minimal shared-member graph
    {(26,39),(30,39)} — condition 1 of the star-forest check holds on
    the raw input (no root is a member), so the pre-fix predicate
    declared convergence immediately and emitted vertex 39 twice with
    two different labels. The corrected predicate (no member has two
    roots) forces the merging round."""
    edges = spark.createDataFrame([(26, 39), (30, 39)], ["src", "dst"])
    got = {
        int(r.id): int(r.component)
        for r in connected_components(edges).collect()
    }
    assert got == {26: 26, 30: 26, 39: 26}


def test_star_with_shared_members_fuzz(spark):
    """Property fuzz aimed at the early-stop geometry: unions of
    'cherries' and small stars whose roots never appear as members on
    the raw input. Every vertex must get exactly one label, equal to
    the union-find answer."""
    import random

    rng = random.Random(1039)
    for trial in range(5):
        edges = []
        used = set()
        base = 0
        for _ in range(rng.randint(2, 6)):
            # a shared member joining k roots, all roots < member
            k = rng.randint(2, 4)
            roots = [base + i for i in range(k)]
            member = base + k + rng.randint(0, 3)
            edges += [(r, member) for r in roots]
            used.update(roots + [member])
            base = max(used) + rng.randint(1, 5)
        parent = {v: v for v in used}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        want = {v: min(w for w in used if find(w) == find(v)) for v in used}
        df = spark.createDataFrame(edges, ["src", "dst"])
        rows = connected_components(df).collect()
        got = {int(r.id): int(r.component) for r in rows}
        assert len(rows) == len(got) == len(used), f"trial {trial}: dup labels"
        assert got == want, f"trial {trial}"


def test_optics_eps_profile_invariants(spark):
    """Accounting + monotonicity of the eps sweep, and the tau=0 row
    must equal the fixed-eps DBSCAN composition (the stability
    profile's min_pts=3 row) — the two sweeps share their origin."""
    from gravity_books_datalakehouse_spark.operators.components import (
        _DBSCAN_MIN_PTS,
        dedup_density_stability_profile,
        dedup_optics_eps_profile,
    )

    rows = sorted(
        dedup_optics_eps_profile(spark, SF_SMOKE).collect(),
        key=lambda r: r.tau,
    )
    assert [r.tau for r in rows] == [0.0, 0.1, 0.2, 0.5, 0.8, 1.0]
    nv = rows[0].n_vertices
    for r in rows:
        assert r.n_vertices == nv, "vertex domain must be tau-independent"
        assert r.n_core + r.n_border + r.n_noise == r.n_vertices, r
        assert r.n_doc_edges >= 0 and r.n_core >= 0 and r.n_border >= 0
    # degree_tau is non-increasing in tau => edges and core mass shrink
    for a, b in zip(rows, rows[1:]):
        assert b.n_doc_edges <= a.n_doc_edges, (a, b)
        assert b.n_core <= a.n_core, (a, b)
    # tau = 0 is the unfiltered candidate graph: identical composition
    # to the minPts sweep's row at the shared _DBSCAN_MIN_PTS
    sp = {
        r.min_pts: r
        for r in dedup_density_stability_profile(spark, SF_SMOKE).collect()
    }
    fixed = sp[_DBSCAN_MIN_PTS]
    assert (rows[0].n_core, rows[0].n_border, rows[0].n_noise) == (
        fixed.n_core,
        fixed.n_border,
        fixed.n_noise,
    )
    assert rows[0].n_vertices == fixed.n_vertices
