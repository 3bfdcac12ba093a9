"""Round-11 operators: temperature mixture and the graph health report
— python replays + structural invariants beyond the DuckDB oracles."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_temperature_mixture_invariants_and_replay(spark):
    from gravity_books_datalakehouse_spark.operators.quality import (
        pipeline_temperature_mixture,
    )
    from gravity_books_datalakehouse_spark.operators.text import tokens_col
    from gravity_books_datalakehouse_spark.sources.catalog import load_table

    rows = pipeline_temperature_mixture(spark, SF_SMOKE).collect()
    assert rows
    for col in ("share_natural", "share_alpha_half", "share_alpha_quarter"):
        s = sum(getattr(r, col) for r in rows)
        assert abs(s - 1.0) < 1e-4, (col, s)
    # temperature flattens: the max share must not increase as alpha
    # drops, the min share must not decrease
    mx = [max(getattr(r, c) for r in rows) for c in
          ("share_natural", "share_alpha_half", "share_alpha_quarter")]
    mn = [min(getattr(r, c) for r in rows) for c in
          ("share_natural", "share_alpha_half", "share_alpha_quarter")]
    assert mx[0] >= mx[1] >= mx[2]
    assert mn[0] <= mn[1] <= mn[2]
    # boost > 1 exactly for sources below the alpha=1/2 pivot share
    for r in rows:
        if r.share_natural < r.share_alpha_half:
            assert r.boost_alpha_half > 1.0, r
        if r.share_natural > r.share_alpha_half:
            assert r.boost_alpha_half < 1.0, r
    # python replay of the exact arithmetic (sqrt chains + in-order sum)
    docs = load_table(spark, SF_SMOKE, "documents")
    tok = {
        r.source: (r.n, r.t)
        for r in docs.select(
            "source", F.coalesce(F.size(tokens_col()), F.lit(0)).alias("nt")
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("nt").alias("t"))
        .collect()
    }
    srcs = sorted(tok)
    tot = sum(tok[s][1] for s in srcs)
    den_sq = 0.0
    den_qq = 0.0
    for s in srcs:  # in-order accumulation, matching both engines
        den_sq += math.sqrt(float(tok[s][1]))
        den_qq += math.sqrt(math.sqrt(float(tok[s][1])))
    for r in rows:
        n, t = tok[r.source]
        assert r.n_docs == n and r.total_tokens == t
        assert r.share_natural == round(t * 1.0 / tot, 6)
        assert r.share_alpha_half == round(math.sqrt(float(t)) / den_sq, 6)
        assert r.share_alpha_quarter == round(
            math.sqrt(math.sqrt(float(t))) / den_qq, 6
        )


def test_graph_global_stats_replay(spark):
    from gravity_books_datalakehouse_spark.operators.graph import (
        copurchase_edges,
        op_graph_global_stats,
    )
    from gravity_books_datalakehouse_spark.sources.catalog import load_table

    row = op_graph_global_stats(spark, SF_SMOKE).collect()
    assert len(row) == 1
    row = row[0]
    li = load_table(spark, SF_SMOKE, "lineitem")
    e = {
        (r.src, r.dst)
        for r in copurchase_edges(li).collect()
        if r.src < r.dst
    }
    nbrs: dict[int, set[int]] = {}
    for u, v in e:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    deg = {n: len(s) for n, s in nbrs.items()}
    tri = sum(
        1 for (u, v) in e for w in (nbrs[u] & nbrs[v]) if v < w
    )
    wed = sum(d * (d - 1) // 2 for d in deg.values())
    m = 2 * len(e)
    sx = sum(deg[u] + deg[v] for u, v in e)
    sxy = 2 * sum(deg[u] * deg[v] for u, v in e)
    sxx = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in e)
    assert row.n_nodes == len(deg)
    assert row.n_edges == len(e)
    assert row.n_triangles == tri
    assert row.n_wedges == wed
    assert row.global_clustering == round(3.0 * tri / wed, 6)
    assert row.degree_assortativity == round(
        (m * sxy - sx * sx) / (m * sxx - sx * sx), 6
    )
    # a co-purchase graph is hub-leaf shaped: assortativity is a
    # correlation, bounded in [-1, 1]
    assert -1.0 <= row.degree_assortativity <= 1.0


def test_change_point_cusum_replay(spark):
    """Pure-python CUSUM replay over the gap-filled hourly series: the
    argmax, tie rule, and both segment means must match exactly."""
    from datetime import timedelta

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        ev_change_point_cusum,
        load_events,
    )

    ev = load_events(spark, SF_SMOKE)
    hourly = (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("x"))
        .select("event_type", F.col("w.start").alias("h"), "x")
        .collect()
    )
    series: dict[str, dict] = {}
    for r in hourly:
        series.setdefault(r.event_type, {})[r.h] = r.x
    want = {}
    for et, cells in series.items():
        h0, h1 = min(cells), max(cells)
        hs, xs = [], []
        h = h0
        while h <= h1:
            hs.append(h)
            xs.append(cells.get(h, 0))
            h += timedelta(hours=1)
        n, t = len(xs), sum(xs)
        best = None
        p = 0
        for i in range(1, n):
            p += xs[i - 1]
            d = abs(n * p - i * t)
            if best is None or d > best[0]:
                best = (d, i, p)
        d, i, p = best
        want[et] = (
            hs[i - 1].strftime("%Y-%m-%d %H:%M:%S"),
            n,
            t,
            d,
            round(p / i, 6),
            round((t - p) / (n - i), 6),
        )
    got = {
        r.event_type: (
            r.change_hour, r.n_hours, r.n_events, r.max_scaled_dev,
            r.mean_before, r.mean_after,
        )
        for r in ev_change_point_cusum(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_mixture_diversity_invariants(spark):
    """Temperature flattens the mixture: effective sources rise
    (weakly) as alpha drops; all values bounded by [1, n_sources];
    max_share consistent with the per-source mixture table."""
    from gravity_books_datalakehouse_spark.operators.quality import (
        pipeline_mixture_diversity,
        pipeline_temperature_mixture,
    )

    rows = {
        r.alpha: r
        for r in pipeline_mixture_diversity(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {"alpha_1", "alpha_1_2", "alpha_1_4"}
    ns = rows["alpha_1"].n_sources
    for r in rows.values():
        assert 1.0 - 1e-9 <= r.effective_sources <= ns + 1e-9, r
        assert abs(r.simpson_concentration * r.effective_sources - 1.0) < 1e-4
    assert (
        rows["alpha_1"].effective_sources
        <= rows["alpha_1_2"].effective_sources + 1e-9
        <= rows["alpha_1_4"].effective_sources + 2e-9
    )
    assert (
        rows["alpha_1"].max_share
        >= rows["alpha_1_2"].max_share - 1e-9
        >= rows["alpha_1_4"].max_share - 2e-9
    )
    mix = pipeline_temperature_mixture(spark, SF_SMOKE).collect()
    assert rows["alpha_1"].max_share == max(r.share_natural for r in mix)
    assert rows["alpha_1_2"].max_share == max(r.share_alpha_half for r in mix)
    assert rows["alpha_1_4"].max_share == max(
        r.share_alpha_quarter for r in mix
    )


def test_seasonality_strength_replay(spark):
    """Pure-python eta^2 replay with the same hod-ordered accumulation."""
    from datetime import timedelta

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        ev_seasonality_strength,
        load_events,
    )

    ev = load_events(spark, SF_SMOKE)
    hourly = (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("x"))
        .select("event_type", F.col("w.start").alias("h"), "x")
        .collect()
    )
    series: dict[str, dict] = {}
    for r in hourly:
        series.setdefault(r.event_type, {})[r.h] = r.x
    want = {}
    for et, cells in series.items():
        h0, h1 = min(cells), max(cells)
        xs, hods = [], []
        h = h0
        while h <= h1:
            xs.append(cells.get(h, 0))
            hods.append(h.hour)
            h += timedelta(hours=1)
        n, t = len(xs), sum(xs)
        sxx = sum(x * x for x in xs)
        grp: dict[int, list] = {}
        for hod, x in zip(hods, xs):
            grp.setdefault(hod, []).append(x)
        ssq = 0.0
        for hod in sorted(grp):  # hod-ordered accumulation, both engines
            sg, ng = sum(grp[hod]), len(grp[hod])
            ssq += sg * sg * 1.0 / ng
        corr = t * t * 1.0 / n
        want[et] = (n, t, round((ssq - corr) / (sxx - corr), 6))
    got = {
        r.event_type: (r.n_hours, r.n_events, r.eta2_hour_of_day)
        for r in ev_seasonality_strength(spark, SF_SMOKE).collect()
    }
    assert got == want
    for n, t, e2 in want.values():
        assert -1e-9 <= e2 <= 1.0 + 1e-9


def test_kn_bigram_normalization_and_replay(spark):
    """Interpolated KN must be a proper distribution per context
    (sum over the FULL vocab of p(w|v) == 1: discounted mass +
    redistributed continuation mass) and the op must match a
    pure-python replay on a small corpus."""
    import math

    from gravity_books_datalakehouse_spark.operators.lm import (
        _KN_D,
        text_kn_bigram_logprob,
    )

    corpus = [
        (0, "san francisco is far from new york city"),
        (1, "new york city is big and san francisco is small"),
        (2, "the city is big the bay is cold"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")

    # python model
    bgs = []
    for doc_id, text in corpus:
        toks = text.lower().split()
        bgs += [(doc_id, (toks[i], toks[i + 1])) for i in range(len(toks) - 1)]
    from collections import Counter, defaultdict

    c2 = Counter(b for _, b in bgs)
    c1 = Counter(b[0] for _, b in bgs)
    n1f = defaultdict(set)
    n1b = defaultdict(set)
    for _, (a, b) in bgs:
        n1f[a].add(b)
        n1b[b].add(a)
    B = len(c2)
    vocab = set(c1) | set(n1b)

    def p(w2, w1):
        disc = max(c2.get((w1, w2), 0) - _KN_D, 0.0) / c1[w1]
        back = (_KN_D * len(n1f[w1]) / c1[w1]) * (len(n1b[w2]) / B)
        return disc + back

    for v in c1:  # proper distribution over the full vocab
        assert abs(sum(p(w, v) for w in vocab) - 1.0) < 1e-9, v

    want = {}
    for doc_id, _ in corpus:
        lps = [math.log(p(b, a)) for d, (a, b) in bgs if d == doc_id]
        want[doc_id] = (len(lps), round(sum(lps) / len(lps), 6))

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        got = {
            r.doc_id: (r.n_bigrams, r.avg_logprob)
            for r in text_kn_bigram_logprob(spark, td).collect()
        }
    assert got == want


def test_kn_trigram_normalization_and_replay(spark):
    """Full interpolated trigram KN: proper distribution per (u,v)
    context over the trigram-type vocabulary (telescoping through both
    lower orders) and an exact python replay on a small corpus."""
    import math
    import tempfile
    from collections import Counter, defaultdict

    from gravity_books_datalakehouse_spark.operators.lm import (
        _KN_D,
        text_kn_trigram_logprob,
    )

    corpus = [
        (0, "the cat sat on the mat and the cat ran"),
        (1, "the dog sat on the rug and the dog ran fast"),
        (2, "a cat and a dog sat on the mat"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")

    tris = []
    for doc_id, text in corpus:
        t = text.lower().split()
        tris += [
            (doc_id, (t[i], t[i + 1], t[i + 2])) for i in range(len(t) - 2)
        ]
    c3 = Counter(g for _, g in tris)
    cuv = Counter((g[0], g[1]) for _, g in tris)
    n1f = defaultdict(set)     # distinct w after (u,v)
    n1b = defaultdict(set)     # distinct u before (v,w)
    nmid = defaultdict(set)    # distinct (u,w) around v
    nafter = defaultdict(set)  # distinct w after v (trigram level)
    nctx = defaultdict(set)    # distinct (u,v) before w
    for _, (u, v, w) in tris:
        n1f[(u, v)].add(w)
        n1b[(v, w)].add(u)
        nmid[v].add((u, w))
        nafter[v].add(w)
        nctx[w].add((u, v))
    B = len(c3)
    vocab = {g[2] for g in c3} | {g[0] for g in c3} | {g[1] for g in c3}

    def p1(w):
        return len(nctx.get(w, ())) / B

    def p2(w, v):
        disc = max(len(n1b.get((v, w), ())) - _KN_D, 0.0) / len(nmid[v])
        lam = _KN_D * len(nafter[v]) / len(nmid[v])
        return disc + lam * p1(w)

    def p3(w, u, v):
        disc = max(c3.get((u, v, w), 0) - _KN_D, 0.0) / cuv[(u, v)]
        lam = _KN_D * len(n1f[(u, v)]) / cuv[(u, v)]
        return disc + lam * p2(w, v)

    # telescoping normalization: sum over the trigram-type vocab == 1
    # for every observed context (u,v) — p1 sums to 1 over third-word
    # types, so p2 and p3 inherit it
    third = {g[2] for g in c3}
    assert abs(sum(p1(w) for w in third) - 1.0) < 1e-9
    for (u, v) in cuv:
        assert abs(sum(p3(w, u, v) for w in third | vocab) - 1.0) < 1e-9

    want = {}
    for doc_id, _ in corpus:
        lps = [math.log(p3(w, u, v)) for d, (u, v, w) in tris if d == doc_id]
        want[doc_id] = (len(lps), round(sum(lps) / len(lps), 6))

    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        got = {
            r.doc_id: (r.n_trigrams, r.avg_logprob)
            for r in text_kn_trigram_logprob(spark, td).collect()
        }
    assert got == want
