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


def test_cluster_persistence_invariants(spark):
    """Structural invariants of the condensed-tree output: contiguous
    alive band (birth >= death), masses monotone as tau falls
    (docs_at_birth <= docs_at_death, both >= 2), stability equals the
    replayed band integral, and every verbatim-dup group (mult >= 2)
    births at tau = 1.0."""
    from gravity_books_datalakehouse_spark.operators.components import (
        dedup_cluster_persistence,
    )
    from gravity_books_datalakehouse_spark.operators.dedup import (
        _cached_exact_groups,
    )

    rows = dedup_cluster_persistence(spark, SF_SMOKE).collect()
    assert rows, "smoke corpus must contain at least one cluster"
    for r in rows:
        assert r.birth_tau >= r.death_tau
        assert 2 <= r.docs_at_birth <= r.docs_at_death
        assert r.n_levels_alive >= 1
        assert r.stability >= 0.0
    # mult>=2 exact-dup groups are clusters from tau=1.0 down, labeled
    # by their rep (which stays the minimum until a merge below)
    gm = (
        _cached_exact_groups(spark, SF_SMOKE)
        .where(F.col("doc_id") == F.col("rep_doc_id"))
        .where(F.col("mult") >= 2)
        .select("rep_doc_id")
        .collect()
    )
    births = {r.cluster_rep: r.birth_tau for r in rows}
    for g in gm:
        # the group's own label births at 1.0 unless a smaller-labeled
        # component already absorbed it at every level (only possible
        # if the label never appears at all)
        if g.rep_doc_id in births:
            assert births[g.rep_doc_id] == 1.0


def test_cluster_persistence_tau0_matches_cc(spark):
    """The tau=0 slice of the dendrogram IS connected components of the
    unfiltered candidate graph: clusters alive at death_tau = 0 must
    reproduce the CC assignment's cluster sizes exactly (same labels,
    same doc masses)."""
    from gravity_books_datalakehouse_spark.operators.components import (
        dedup_cluster_persistence,
        dedup_clusters_connected_components,
    )

    rows = dedup_cluster_persistence(spark, SF_SMOKE).collect()
    at0 = {
        r.cluster_rep: r.docs_at_death for r in rows if r.death_tau == 0.0
    }
    cc = (
        dedup_clusters_connected_components(spark, SF_SMOKE)
        .groupBy("cluster_rep")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .collect()
    )
    want = {r.cluster_rep: r.n for r in cc}
    assert at0 == want


def test_cluster_persistence_python_replay(spark):
    """Full-output pin against a pure-python union-find replay over the
    same rep edges (stamped with their max passing grid level) and
    group multiplicities."""
    from gravity_books_datalakehouse_spark.operators.components import (
        _PERSIST_W10,
        _cached_rep_jaccard,
        dedup_cluster_persistence,
    )
    from gravity_books_datalakehouse_spark.operators.dedup import (
        _cached_exact_groups,
    )

    gm = {
        r.rep_doc_id: r.mult
        for r in _cached_exact_groups(spark, SF_SMOKE)
        .where(F.col("doc_id") == F.col("rep_doc_id"))
        .collect()
    }
    edges = [
        (r.doc_a, r.doc_b, r.n_int, r.u)
        for r in _cached_rep_jaccard(spark, SF_SMOKE).collect()
    ]
    levels = sorted(_PERSIST_W10, reverse=True)
    edged = {a for a, _, _, _ in edges} | {b for _, b, _, _ in edges}
    dom = sorted(g for g, m in gm.items() if m >= 2 or g in edged)

    parent = {g: g for g in dom}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo  # min-label root, matching the engine

    alive: dict[int, list] = {}  # lbl -> [(t10, mass)]
    for t in levels:
        for a, b, n_int, u in edges:
            if 10 * n_int >= t * u:
                union(a, b)
        mass: dict[int, int] = {}
        for g in dom:
            mass[find(g)] = mass.get(find(g), 0) + gm[g]
        for lbl, m in mass.items():
            if m >= 2:
                alive.setdefault(lbl, []).append((t, m))
    want = {}
    for lbl, band in alive.items():
        t10s = [t for t, _ in band]
        masses = {t: m for t, m in band}
        want[lbl] = (
            max(t10s) / 10.0,
            min(t10s) / 10.0,
            len(band),
            masses[max(t10s)],
            masses[min(t10s)],
            sum(m * _PERSIST_W10[t] for t, m in band) / 10.0,
        )
    got = {
        r.cluster_rep: (
            r.birth_tau,
            r.death_tau,
            r.n_levels_alive,
            r.docs_at_birth,
            r.docs_at_death,
            r.stability,
        )
        for r in dedup_cluster_persistence(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_cluster_extraction_python_replay(spark):
    """Full-output pin of the excess-of-mass extraction against a pure
    python replay: union-find per level -> nodes -> parents -> bottom-up
    S* DP -> coverage descent, all in integer tenths."""
    from gravity_books_datalakehouse_spark.operators.components import (
        _PERSIST_NEXT,
        _PERSIST_W10,
        _cached_rep_jaccard,
        dedup_cluster_extraction,
    )
    from gravity_books_datalakehouse_spark.operators.dedup import (
        _cached_exact_groups,
    )

    gm = {
        r.rep_doc_id: r.mult
        for r in _cached_exact_groups(spark, SF_SMOKE)
        .where(F.col("doc_id") == F.col("rep_doc_id"))
        .collect()
    }
    edges = [
        (r.doc_a, r.doc_b, r.n_int, r.u)
        for r in _cached_rep_jaccard(spark, SF_SMOKE).collect()
    ]
    levels = sorted(_PERSIST_W10, reverse=True)
    edged = {a for a, _, _, _ in edges} | {b for _, b, _, _ in edges}
    dom = sorted(g for g, m in gm.items() if m >= 2 or g in edged)
    parent_uf = {g: g for g in dom}

    def find(x):
        while parent_uf[x] != x:
            parent_uf[x] = parent_uf[parent_uf[x]]
            x = parent_uf[x]
        return x

    lab_at = {}  # (t10, g) -> lbl
    for t in levels:
        for a, b, n_int, u in edges:
            if 10 * n_int >= t * u:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent_uf[max(ra, rb)] = min(ra, rb)
        for g in dom:
            lab_at[(t, g)] = find(g)
    # nodes
    alive = {}
    for t in levels:
        mass = {}
        for g in dom:
            mass[lab_at[(t, g)]] = mass.get(lab_at[(t, g)], 0) + gm[g]
        for lbl, m in mass.items():
            if m >= 2:
                alive.setdefault(lbl, {})[t] = m
    nodes = {
        lbl: (
            max(band),
            min(band),
            sum(m * _PERSIST_W10[t] for t, m in band.items()),
        )
        for lbl, band in alive.items()
    }
    par = {
        lbl: lab_at[(_PERSIST_NEXT[d10], lbl)]
        for lbl, (_, d10, _) in nodes.items()
        if d10 > 0
    }
    sstar, wins, nch = {}, {}, {}
    for t in levels:  # descending death level
        for lbl, (_, d10, st10) in nodes.items():
            if d10 != t:
                continue
            kids = [c for c, p in par.items() if p == lbl and c in sstar]
            nch[lbl] = len(kids)
            if not kids:
                sstar[lbl], wins[lbl] = st10, 1
            else:
                ks = sum(sstar[c] for c in kids)
                sstar[lbl] = max(st10, ks)
                wins[lbl] = 1 if st10 >= ks else 0
    covered = {lbl: 0 for lbl, (_, d10, _) in nodes.items() if d10 == 0}
    for t in (1, 2, 5, 8, 10):
        for lbl, (_, d10, _) in nodes.items():
            if d10 == t:
                p = par[lbl]
                covered[lbl] = 1 if (wins[p] == 1 or covered[p] == 1) else 0
    want = {
        lbl: (
            b10 / 10.0,
            d10 / 10.0,
            par.get(lbl),
            nch[lbl],
            st10 / 10.0,
            sstar[lbl] / 10.0,
            1 if wins[lbl] == 1 and covered[lbl] == 0 else 0,
        )
        for lbl, (b10, d10, st10) in nodes.items()
    }
    got = {
        r.cluster_rep: (
            r.birth_tau,
            r.death_tau,
            r.parent_rep,
            r.n_children,
            r.stability,
            r.subtree_stability,
            r.is_selected,
        )
        for r in dedup_cluster_extraction(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_cluster_extraction_is_a_partition(spark):
    """The defining property of excess-of-mass selection: the selected
    nodes are non-overlapping and cover the tree — every LEAF has
    exactly one selected node on its root path (ancestors-or-self)."""
    from gravity_books_datalakehouse_spark.operators.components import (
        dedup_cluster_extraction,
    )

    rows = dedup_cluster_extraction(spark, SF_SMOKE).collect()
    par = {r.cluster_rep: r.parent_rep for r in rows}
    sel = {r.cluster_rep: r.is_selected for r in rows}
    children = {p for p in par.values() if p is not None}
    leaves = [r.cluster_rep for r in rows if r.n_children == 0]
    assert leaves
    for leaf in leaves:
        n_sel, node = 0, leaf
        while node is not None:
            n_sel += sel[node]
            node = par[node]
        assert n_sel == 1, f"leaf {leaf} has {n_sel} selected ancestors"
    # sanity: children set consistent with n_children
    assert children <= set(sel)
