"""ev_markov_stationary vs a numpy power-iteration replay."""

from __future__ import annotations

import numpy as np


def test_markov_stationary_matches_numpy(spark):
    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _MARKOV_SWEEPS,
        ev_markov_stationary,
        load_events,
    )

    sf = "/root/testdata/sf0.001"
    pdf = (
        load_events(spark, sf)
        .select("user_id", "event_type", "ts", "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    pdf["next"] = pdf.groupby("user_id")["event_type"].shift(-1)
    seq = pdf.dropna(subset=["next"])
    types = sorted(seq["event_type"].unique())
    idx = {t: i for i, t in enumerate(types)}
    counts = np.zeros((len(types), len(types)))
    for (f, t), n in seq.groupby(["event_type", "next"]).size().items():
        counts[idx[f], idx[t]] = n
    P = counts / counts.sum(1, keepdims=True)
    p = np.full(len(types), 1.0 / len(types))
    for _ in range(_MARKOV_SWEEPS):
        p = p @ P
    got = {
        r["event_type"]: (
            int(r["n_out_transitions"]),
            float(r["stationary_prob"]),
        )
        for r in ev_markov_stationary(spark, sf).collect()
    }
    assert set(got) == set(types)
    for t in types:
        assert got[t][0] == int(counts[idx[t]].sum())
        assert abs(got[t][1] - round(p[idx[t]], 6)) < 1e-9
