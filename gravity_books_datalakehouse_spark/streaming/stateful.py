"""Custom stateful streaming operator via applyInPandasWithState.

The brief's "custom stateful operators" slot (SURVEY.md §2.7 — streaming
is ABSENT in the reference; this is engine-native extension surface):
a per-key running aggregator that Structured Streaming's built-in
aggregations can't express directly — here, per event_type state holding
(count, value sum, max single gap between events) maintained across
micro-batches with timeout-free GroupState.

Used by tests/test_streaming.py to prove state survives across
micro-batches (two-file source, maxFilesPerTrigger=1 ⇒ ≥2 batches).

Scale: state lives in the state store keyed by event_type (bounded
cardinality); swap HDFS-backed store for RocksDB at large key counts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_type string, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double, last_us long"


def _update_type_state(
    key: tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum, latest ts) per event_type across batches."""
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            batch_last = pdf["ts"].max()
            last_us = max(last_us, int(batch_last.value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def running_type_totals(events: DataFrame) -> DataFrame:
    """Streaming per-type running totals with explicit GroupState."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_type_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming twin of ev_time_weighted_avg_value: a per-USER GroupState
# holds (last event-time in whole seconds — unix_timestamp semantics,
# matching the batch twin's dt — last integer 1e-4 value units, last
# event type); each micro-batch folds its events in event-time order against
# that state and EMITS the batch's per-type (Σ units·dt, Σ dt)
# contributions — append-mode rows a downstream aggregate sums into
# exactly the batch operator's time-weighted totals. Requires per-key
# event-time-ordered arrival across micro-batches (the standard
# streaming-TWA contract; out-of-order sources buffer behind a
# watermark first — the test builds a time-ordered two-file source).

TWA_OUTPUT_SCHEMA = "user_id long, event_type string, s long, d long"
TWA_STATE_SCHEMA = "last_s long, last_units long, last_type string"


def _twa_update(
    key: tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last_us, last_units, last_type = (
        state.get if state.exists else (None, None, None)
    )
    agg: dict[str, list[int]] = {}
    # A group's micro-batch rows may span multiple Arrow chunks;
    # sorting each chunk independently would leave rows out of order
    # ACROSS chunk boundaries, so concatenate first and sort once —
    # then assert the cross-batch ordered-arrival contract loudly
    # instead of silently folding a negative dt.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        for ts, eid, et, units in zip(
            pdf["ts"], pdf["event_id"], pdf["event_type"], pdf["units"]
        ):
            # truncate each timestamp to whole seconds BEFORE differencing
            # (unix_timestamp semantics — the batch twin's dt), not the
            # µs difference floored: they disagree on sub-second events
            us = int(ts.value // 1_000_000_000)
            if last_us is not None:
                dt_s = us - last_us
                if dt_s < 0:
                    raise ValueError(
                        "streaming TWA requires per-key event-time-ordered "
                        f"arrival across micro-batches; got dt={dt_s}s for "
                        f"user {key[0]} (buffer behind a watermark first)"
                    )
                a = agg.setdefault(last_type, [0, 0])
                a[0] += last_units * dt_s
                a[1] += dt_s
            last_us, last_units, last_type = us, int(units), et
    if last_us is not None:
        state.update((last_us, last_units, last_type))
    yield pd.DataFrame(
        [
            {"user_id": key[0], "event_type": t, "s": v[0], "d": v[1]}
            for t, v in agg.items()
        ],
        columns=["user_id", "event_type", "s", "d"],
    )


def streaming_twa_contributions(events_with_units: DataFrame) -> DataFrame:
    """Per-batch time-weighted contributions (user, holding type,
    Σ units·dt, Σ dt) with per-user GroupState. Input needs columns
    (user_id, ts, event_id, event_type, units)."""
    return events_with_units.groupBy("user_id").applyInPandasWithState(
        _twa_update,
        outputStructType=TWA_OUTPUT_SCHEMA,
        stateStructType=TWA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming twin of ev_ewma_control: a per-TYPE GroupState holds the
# last-24-hour integer count history (the exact 2^-j weight window) plus
# the last folded hour and the folded-hour count; each micro-batch
# counts its events per hour in-state, zero-fills any gap hours since
# the previous batch (the batch operator's spine join, done
# incrementally), and emits one row per folded hour once a full 24-hour
# history exists — (x, S, alert) in the SAME exact-integer algebra as
# the batch chart (S = Σ x_{t-j}·2^(24-j), alert ⟺ x ≥ min AND
# x·(2^24-1) > 2S; no float on the decision path). Contract: per-type
# hour buckets arrive whole and in event-time order across micro-batches
# (a production source windows + watermarks upstream; the test aligns
# its file split to an hour boundary). Violations raise, never fold
# silently.

_EWMA_TWIN_LAGS = 24
_EWMA_TWIN_MIN_COUNT = 5
_EWMA_TWIN_NORM = (1 << _EWMA_TWIN_LAGS) - 1

EWMA_OUTPUT_SCHEMA = (
    "event_type string, window_start timestamp, x long, s long,"
    " alert_flag boolean"
)
EWMA_STATE_SCHEMA = "last_h long, n_seen long, hist array<long>"


def _ewma_update(
    key: tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_h, n_seen, hist = state.get
        hist = list(hist)
    else:
        last_h, n_seen, hist = None, 0, [0] * _EWMA_TWIN_LAGS
    chunks = [pdf for pdf in pdfs if len(pdf)]
    out: list[dict] = []
    if chunks:
        pdf = pd.concat(chunks)
        # whole-second hour buckets, matching F.window("ts", "1 hour")
        hours = (pdf["ts"].astype("int64") // 1_000_000_000) // 3600 * 3600
        counts = hours.value_counts().sort_index()
        first_h = int(counts.index[0])
        if last_h is not None and first_h <= last_h:
            raise ValueError(
                "streaming EWMA requires whole, event-time-ordered hour "
                f"buckets across micro-batches; got hour {first_h} after "
                f"{last_h} for type {key[0]}"
            )
        start = first_h if last_h is None else last_h + 3600
        for h in range(start, int(counts.index[-1]) + 3600, 3600):
            x = int(counts.get(h, 0))
            if n_seen >= _EWMA_TWIN_LAGS:
                # S over the previous 24 hours; hist[0] is x_{t-1}
                s = sum(
                    hist[i] << (_EWMA_TWIN_LAGS - 1 - i)
                    for i in range(_EWMA_TWIN_LAGS)
                )
                out.append(
                    {
                        "event_type": key[0],
                        "window_start": pd.Timestamp(h, unit="s"),
                        "x": x,
                        "s": s,
                        "alert_flag": bool(
                            x >= _EWMA_TWIN_MIN_COUNT
                            and x * _EWMA_TWIN_NORM > 2 * s
                        ),
                    }
                )
            hist = [x] + hist[: _EWMA_TWIN_LAGS - 1]
            n_seen += 1
            last_h = h
        state.update((last_h, n_seen, hist))
    yield pd.DataFrame(
        out,
        columns=["event_type", "window_start", "x", "s", "alert_flag"],
    )


def streaming_ewma_alerts(events: DataFrame) -> DataFrame:
    """Per-hour EWMA control rows maintained incrementally per
    event_type. Input needs columns (event_type, ts)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _ewma_update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- seasonal (Holt-Winters-flavored) EWMA control twin --------------------
# Streaming twin of batch ev_seasonal_ewma_control (event_queries.py):
# the fourth batch/stream pair. Same GroupState idiom as the EWMA twin
# but the per-type integer history holds the FULL seasonal horizon
# (7 days x 24 h = 168 trailing hourly counts): the level baseline
# reads hist[0..23], the seasonal baseline reads the same hour-of-day
# slots hist[24j-1] for j=1..7. Both sums are the batch chart's exact
# dyadic bigints; both alert legs are pure integer comparisons. Same
# ordered-arrival contract as the EWMA twin — violations raise.

_SEWMA_TWIN_SEASONS = 7
_SEWMA_TWIN_PERIOD = 24
_SEWMA_TWIN_LAGS = _SEWMA_TWIN_SEASONS * _SEWMA_TWIN_PERIOD  # 168
_SEWMA_TWIN_NORM = (1 << _SEWMA_TWIN_SEASONS) - 1

SEWMA_OUTPUT_SCHEMA = (
    "event_type string, window_start timestamp, x long, s_lvl long,"
    " s_sea long, level_alert boolean, seasonal_alert boolean,"
    " alert_flag boolean"
)
SEWMA_STATE_SCHEMA = "last_h long, n_seen long, hist array<long>"


def _seasonal_ewma_update(
    key: tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_h, n_seen, hist = state.get
        hist = list(hist)
    else:
        last_h, n_seen, hist = None, 0, [0] * _SEWMA_TWIN_LAGS
    chunks = [pdf for pdf in pdfs if len(pdf)]
    out: list[dict] = []
    if chunks:
        pdf = pd.concat(chunks)
        hours = (pdf["ts"].astype("int64") // 1_000_000_000) // 3600 * 3600
        counts = hours.value_counts().sort_index()
        first_h = int(counts.index[0])
        if last_h is not None and first_h <= last_h:
            raise ValueError(
                "streaming seasonal EWMA requires whole, event-time-ordered "
                f"hour buckets across micro-batches; got hour {first_h} "
                f"after {last_h} for type {key[0]}"
            )
        start = first_h if last_h is None else last_h + 3600
        for h in range(start, int(counts.index[-1]) + 3600, 3600):
            x = int(counts.get(h, 0))
            if n_seen >= _SEWMA_TWIN_LAGS:
                # hist[i] = x_{t-1-i}; level over the last 24 hours,
                # seasonal over the same hour-of-day slots 24j back
                s_lvl = sum(
                    hist[i] << (_EWMA_TWIN_LAGS - 1 - i)
                    for i in range(_EWMA_TWIN_LAGS)
                )
                s_sea = sum(
                    hist[j * _SEWMA_TWIN_PERIOD - 1]
                    << (_SEWMA_TWIN_SEASONS - j)
                    for j in range(1, _SEWMA_TWIN_SEASONS + 1)
                )
                guard = x >= _EWMA_TWIN_MIN_COUNT
                lvl_ok = x * _EWMA_TWIN_NORM > 2 * s_lvl
                sea_ok = x * _SEWMA_TWIN_NORM > 2 * s_sea
                out.append(
                    {
                        "event_type": key[0],
                        "window_start": pd.Timestamp(h, unit="s"),
                        "x": x,
                        "s_lvl": s_lvl,
                        "s_sea": s_sea,
                        "level_alert": bool(guard and lvl_ok),
                        "seasonal_alert": bool(guard and sea_ok),
                        "alert_flag": bool(guard and lvl_ok and sea_ok),
                    }
                )
            hist = [x] + hist[: _SEWMA_TWIN_LAGS - 1]
            n_seen += 1
            last_h = h
        state.update((last_h, n_seen, hist))
    yield pd.DataFrame(
        out,
        columns=[
            "event_type",
            "window_start",
            "x",
            "s_lvl",
            "s_sea",
            "level_alert",
            "seasonal_alert",
            "alert_flag",
        ],
    )


def streaming_seasonal_ewma_alerts(events: DataFrame) -> DataFrame:
    """Per-hour seasonal control rows maintained incrementally per
    event_type. Input needs columns (event_type, ts)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _seasonal_ewma_update,
        outputStructType=SEWMA_OUTPUT_SCHEMA,
        stateStructType=SEWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- online CUSUM twin ------------------------------------------------------
# Streaming twin of batch ev_cusum_online (event_queries.py): the FIFTH
# batch/stream pair, and the one whose state is O(1) — unlike the EWMA
# twins' lag buffers, sequential CUSUM needs only the frozen warmup
# total and the running (prefix, min-prefix) pair, because the batch
# side's reflection identity S = P - min(0, minP) IS the incremental
# recursion. All integers; same ordered-arrival contract.

_CUSUM_TWIN_WARMUP = 168

CUSUM_OUTPUT_SCHEMA = (
    "event_type string, window_start timestamp, x long, t0 long,"
    " cusum_scaled long, alert_flag boolean"
)
CUSUM_STATE_SCHEMA = "last_h long, n_seen long, t0 long, p long, minp long"


def _cusum_update(
    key: tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_h, n_seen, t0, p, minp = state.get
    else:
        last_h, n_seen, t0, p, minp = None, 0, 0, 0, None
    chunks = [pdf for pdf in pdfs if len(pdf)]
    out: list[dict] = []
    if chunks:
        pdf = pd.concat(chunks)
        hours = (pdf["ts"].astype("int64") // 1_000_000_000) // 3600 * 3600
        counts = hours.value_counts().sort_index()
        first_h = int(counts.index[0])
        if last_h is not None and first_h <= last_h:
            raise ValueError(
                "streaming CUSUM requires whole, event-time-ordered hour "
                f"buckets across micro-batches; got hour {first_h} after "
                f"{last_h} for type {key[0]}"
            )
        start = first_h if last_h is None else last_h + 3600
        for h in range(start, int(counts.index[-1]) + 3600, 3600):
            x = int(counts.get(h, 0))
            if n_seen < _CUSUM_TWIN_WARMUP:
                t0 += x
            else:
                d = 2 * _CUSUM_TWIN_WARMUP * x - 3 * t0
                p += d
                minp = p if minp is None else min(minp, p)
                s = p - min(0, minp)
                out.append(
                    {
                        "event_type": key[0],
                        "window_start": pd.Timestamp(h, unit="s"),
                        "x": x,
                        "t0": t0,
                        "cusum_scaled": s,
                        "alert_flag": bool(s > 10 * t0),
                    }
                )
            n_seen += 1
            last_h = h
        state.update((last_h, n_seen, t0, p, minp))
    yield pd.DataFrame(
        out,
        columns=[
            "event_type",
            "window_start",
            "x",
            "t0",
            "cusum_scaled",
            "alert_flag",
        ],
    )


def streaming_cusum_alerts(events: DataFrame) -> DataFrame:
    """Per-hour online-CUSUM rows maintained incrementally per
    event_type with O(1) GroupState. Input needs (event_type, ts)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _cusum_update,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- offline change-point twin: the anytime argmax over GroupState --------
# Streaming twin of batch ev_change_point_cusum (event_queries.py): the
# SIXTH batch/stream pair. The offline statistic argmax_i |N*prefix_i -
# i*T| depends on the FINAL N and T, so unlike the five incremental
# twins this one keeps the whole gap-filled prefix-sum history in state
# (one long per hour — a year of hourly buckets is 8760 longs; the
# documented O(hours) bound) and re-evaluates the integer argmax after
# each appended hour. Every emitted row is therefore the BATCH operator
# evaluated over the OBSERVED spine [first hour, emitted hour] — the
# anytime change-point estimate; gap hours backfilled by a later batch
# extend the spine with zeros exactly as the batch op's gap fill would
# once events arrive beyond them. The final row per type bit-equals
# ev_change_point_cusum on the full input (integer columns; the batch
# op's two displayed means are best_prefix/best_i and
# (T-best_prefix)/(N-best_i) single divisions).
# Same ordered-arrival contract as the other twins: violations raise.

CHANGEPOINT_OUTPUT_SCHEMA = (
    "event_type string, window_start timestamp, change_hour string,"
    " n_hours long, n_events long, max_scaled_dev long,"
    " best_prefix long, best_i long"
)
CHANGEPOINT_STATE_SCHEMA = "first_h long, last_h long, prefixes array<long>"


def _change_point_update(
    key: tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        first_h, last_h, prefixes = state.get
        prefixes = list(prefixes)
    else:
        first_h, last_h, prefixes = None, None, []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    out: list[dict] = []
    if chunks:
        pdf = pd.concat(chunks)
        hours = (pdf["ts"].astype("int64") // 1_000_000_000) // 3600 * 3600
        counts = hours.value_counts().sort_index()
        batch_first = int(counts.index[0])
        if last_h is not None and batch_first <= last_h:
            raise ValueError(
                "streaming change point requires whole, event-time-ordered "
                f"hour buckets across micro-batches; got hour {batch_first} "
                f"after {last_h} for type {key[0]}"
            )
        if first_h is None:
            first_h = batch_first
        start = batch_first if last_h is None else last_h + 3600
        for h in range(start, int(counts.index[-1]) + 3600, 3600):
            x = int(counts.get(h, 0))
            prefixes.append((prefixes[-1] if prefixes else 0) + x)
            last_h = h
            n = len(prefixes)
            if n < 2:
                continue
            t = prefixes[-1]
            best_d = best_i = -1
            for i in range(1, n):  # i < n: interior split points only
                d = abs(n * prefixes[i - 1] - i * t)
                if d > best_d:  # strict: ties keep the EARLIEST hour
                    best_d, best_i = d, i
            out.append(
                {
                    "event_type": key[0],
                    "window_start": pd.Timestamp(h, unit="s"),
                    "change_hour": pd.Timestamp(
                        first_h + (best_i - 1) * 3600, unit="s"
                    ).strftime("%Y-%m-%d %H:%M:%S"),
                    "n_hours": n,
                    "n_events": t,
                    "max_scaled_dev": best_d,
                    "best_prefix": prefixes[best_i - 1],
                    "best_i": best_i,
                }
            )
        state.update((first_h, last_h, prefixes))
    yield pd.DataFrame(
        out,
        columns=[
            "event_type",
            "window_start",
            "change_hour",
            "n_hours",
            "n_events",
            "max_scaled_dev",
            "best_prefix",
            "best_i",
        ],
    )


def streaming_change_point(events: DataFrame) -> DataFrame:
    """Per-hour anytime change-point rows per event_type: each row is
    the offline CUSUM argmax evaluated on the stream-so-far. State is
    the gap-filled prefix-sum history (O(hours) longs). Input needs
    (event_type, ts)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _change_point_update,
        outputStructType=CHANGEPOINT_OUTPUT_SCHEMA,
        stateStructType=CHANGEPOINT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming journey transitions: the Markov-attribution twin -----------
# Streaming twin of batch ev_markov_attribution's transition-matrix
# build (event_queries.py) — the SEVENTH batch/stream pair. Keyed by
# user_id, GroupState holds only the OPEN session's pre-purchase touch
# chain plus (last_ts, last_event_id, purchased) — O(session length)
# per user, the same bound the 30-minute rule itself imposes. When a
# gap > 30 min closes a session (the batch op's strict-`>` boundary,
# pinned by tests/test_session_boundary.py), the closed journey's
# transition edges START -> touches -> CONV/NOCONV are emitted as
# (user_id, f, t, n) increments; summing all emitted rows reproduces
# the batch transition matrix tm EXACTLY (integer counts), and feeding
# that sum through the shared _attribution_rows_from_tm arithmetic
# reproduces the attribution table bit-for-bit — the twin contract.
#
# End-of-stream: sessions that never see a later event stay open, so a
# designated flush sentinel row (event_type = FLUSH_SENTINEL, ts after
# the user's last event) closes the tail session. Production would use
# a processing-time/event-time state timeout for the same effect; the
# sentinel keeps the twin deterministic under availableNow triggers.
# Same ordered-arrival contract as the other twins: per user, event
# (ts, event_id) must be non-decreasing across micro-batches or the
# fold raises.

FLUSH_SENTINEL = "__FLUSH__"
JOURNEY_OUTPUT_SCHEMA = "user_id long, f string, t string, n long"
JOURNEY_STATE_SCHEMA = (
    "last_ts long, last_eid long, types array<string>,"
    " purchased boolean, has_open boolean"
)
_JOURNEY_GAP_NS = 30 * 60 * 1_000_000_000  # the pinned 30-minute rule
_JOURNEY_CONV = "purchase"


def _journey_update(
    key: tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts, last_eid, types, purchased, has_open = state.get
        types = list(types)
    else:
        # last_ts = -1 marks "no event seen yet" so the ordered-arrival
        # check below applies from the second event on, including after
        # a flush closed the open session
        last_ts, last_eid, types, purchased, has_open = -1, -1, [], False, False
    acc: dict[tuple[str, str], int] = {}

    def close_session() -> None:
        toks = ["START"] + types + ["CONV" if purchased else "NOCONV"]
        for f, t in zip(toks, toks[1:]):
            acc[(f, t)] = acc.get((f, t), 0) + 1

    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        for ts, eid, etype in zip(
            pdf["ts"].astype("int64"), pdf["event_id"], pdf["event_type"]
        ):
            ts, eid = int(ts), int(eid)
            if etype == FLUSH_SENTINEL:
                if has_open:
                    close_session()
                    types, purchased, has_open = [], False, False
                continue
            if last_ts >= 0 and (
                ts < last_ts or (ts == last_ts and eid <= last_eid)
            ):
                raise ValueError(
                    "streaming journey fold requires per-user "
                    "(ts, event_id)-ordered arrival across micro-batches; "
                    f"got ({ts}, {eid}) after ({last_ts}, {last_eid}) "
                    f"for user {key[0]}"
                )
            if has_open and ts > last_ts + _JOURNEY_GAP_NS:
                close_session()
                types, purchased = [], False
            has_open = True
            if not purchased:
                if etype == _JOURNEY_CONV:
                    purchased = True
                else:
                    types.append(etype)
            last_ts, last_eid = ts, eid
    state.update((last_ts, last_eid, types, purchased, has_open))
    yield pd.DataFrame(
        [
            {"user_id": key[0], "f": f, "t": t, "n": n}
            for (f, t), n in sorted(acc.items())
        ],
        columns=["user_id", "f", "t", "n"],
    )


def streaming_attribution_journeys(events: DataFrame) -> DataFrame:
    """Per-user journey-transition increments for closed 30-minute
    sessions: (user_id, f, t, n) rows whose global sum is the batch
    Markov-attribution transition matrix. Input needs (user_id, ts,
    event_id, event_type); append a FLUSH_SENTINEL row per user to
    close tail sessions at end of stream."""
    return events.groupBy("user_id").applyInPandasWithState(
        _journey_update,
        outputStructType=JOURNEY_OUTPUT_SCHEMA,
        stateStructType=JOURNEY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# EIGHTH batch/stream twin: per-user survival durations on the error-
# budget clock (the batch side is ev_survival_km_error_budget's
# _error_budget_durations frame). State per user is O(1) — first-event
# ns, last-event ns + event_id, errors seen (capped at the budget), and
# the budget-exhaustion ns once reached; a FLUSH sentinel closes the
# user and emits ONE (user_id, d, ev) row with d in integer epoch-floor
# seconds, exactly the batch frame's algebra. Feeding the emitted rows
# through the shared _km_readout fold reproduces the batch KM table
# bit-for-bit (tests/test_streaming.py) — the twin contract.

SURV_BUDGET = 10  # pin of event_queries._KM_BUDGET (test-asserted)
SURV_OUTPUT_SCHEMA = "user_id long, d long, ev int"
SURV_STATE_SCHEMA = (
    "last_ts long, last_eid long, t0 long, nerr long, te long"
)


def _survival_update(
    key: tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts, last_eid, t0, nerr, te = state.get
    else:
        last_ts, last_eid, t0, nerr, te = -1, -1, -1, 0, -1
    out = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        for ts, eid, etype in zip(
            pdf["ts"].astype("int64"), pdf["event_id"], pdf["event_type"]
        ):
            ts, eid = int(ts), int(eid)
            if etype == FLUSH_SENTINEL:
                if t0 >= 0:
                    end = te if te >= 0 else last_ts
                    d = end // 1_000_000_000 - t0 // 1_000_000_000
                    out.append(
                        {
                            "user_id": key[0],
                            "d": d,
                            "ev": 1 if te >= 0 else 0,
                        }
                    )
                    last_ts, last_eid, t0, nerr, te = -1, -1, -1, 0, -1
                continue
            if last_ts >= 0 and (
                ts < last_ts or (ts == last_ts and eid <= last_eid)
            ):
                raise ValueError(
                    "streaming survival fold requires per-user "
                    "(ts, event_id)-ordered arrival across micro-"
                    f"batches; got ({ts}, {eid}) after ({last_ts}, "
                    f"{last_eid}) for user {key[0]}"
                )
            if t0 < 0:
                t0 = ts
            if etype == "error" and te < 0:
                nerr += 1
                if nerr == SURV_BUDGET:
                    te = ts
            last_ts, last_eid = ts, eid
    state.update((last_ts, last_eid, t0, nerr, te))
    yield pd.DataFrame(out, columns=["user_id", "d", "ev"]).astype(
        {"user_id": "int64", "d": "int64", "ev": "int32"}
    )


def streaming_survival_durations(events: DataFrame) -> DataFrame:
    """Per-user right-censored survival durations on the error-budget
    clock: one (user_id, d, ev) row per user at flush, where d is the
    integer-second span from first event to the budget-th error (ev=1)
    or the last observed event (ev=0). Input needs (user_id, ts,
    event_id, event_type); append a FLUSH_SENTINEL row per user AFTER
    that user's last event to close them out. The emitted frame equals
    batch _error_budget_durations exactly, so downstream KM / Nelson-
    Aalen / log-rank readouts are the shared batch folds."""
    return events.groupBy("user_id").applyInPandasWithState(
        _survival_update,
        outputStructType=SURV_OUTPUT_SCHEMA,
        stateStructType=SURV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# NINTH batch/stream twin: per-user competing-risks durations (the
# batch side is ev_survival_competing_risks' _competing_durations
# frame). Extends the survival twin's O(1) state with the first-
# purchase timestamp: a FLUSH sentinel emits ONE (user_id, d, cause)
# row — cause 1 when the budget's 10th error strikes first (ties to
# exhaustion, the batch rule), 2 when the first purchase does, 0 when
# neither (censored at last event). Feeding the emitted rows through
# the shared _cr_readout fold reproduces the batch Aalen-Johansen
# table bit-for-bit (tests/test_streaming.py).

CR_OUTPUT_SCHEMA = "user_id long, d long, cause int"
CR_STATE_SCHEMA = (
    "last_ts long, last_eid long, t0 long, nerr long, te long, tc long"
)


def _competing_update(
    key: tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts, last_eid, t0, nerr, te, tc = state.get
    else:
        last_ts, last_eid, t0, nerr, te, tc = -1, -1, -1, 0, -1, -1
    out = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        for ts, eid, etype in zip(
            pdf["ts"].astype("int64"), pdf["event_id"], pdf["event_type"]
        ):
            ts, eid = int(ts), int(eid)
            if etype == FLUSH_SENTINEL:
                if t0 >= 0:
                    # the batch tie rule: exhaustion wins te <= tc
                    if te >= 0 and (tc < 0 or te <= tc):
                        end, cause = te, 1
                    elif tc >= 0:
                        end, cause = tc, 2
                    else:
                        end, cause = last_ts, 0
                    d = end // 1_000_000_000 - t0 // 1_000_000_000
                    out.append(
                        {"user_id": key[0], "d": d, "cause": cause}
                    )
                    last_ts, last_eid, t0 = -1, -1, -1
                    nerr, te, tc = 0, -1, -1
                continue
            if last_ts >= 0 and (
                ts < last_ts or (ts == last_ts and eid <= last_eid)
            ):
                raise ValueError(
                    "streaming competing-risks fold requires per-user "
                    "(ts, event_id)-ordered arrival across micro-"
                    f"batches; got ({ts}, {eid}) after ({last_ts}, "
                    f"{last_eid}) for user {key[0]}"
                )
            if t0 < 0:
                t0 = ts
            if etype == "error" and te < 0:
                nerr += 1
                if nerr == SURV_BUDGET:
                    te = ts
            elif etype == "purchase" and tc < 0:
                tc = ts
            last_ts, last_eid = ts, eid
    state.update((last_ts, last_eid, t0, nerr, te, tc))
    yield pd.DataFrame(out, columns=["user_id", "d", "cause"]).astype(
        {"user_id": "int64", "d": "int64", "cause": "int32"}
    )


def streaming_competing_durations(events: DataFrame) -> DataFrame:
    """Per-user competing-risks durations: one (user_id, d, cause) row
    per user at flush — cause 1 = 10th error first (ties to
    exhaustion), 2 = first purchase first, 0 = censored at last event;
    d in integer epoch-floor seconds. Input needs (user_id, ts,
    event_id, event_type); append a FLUSH_SENTINEL row per user AFTER
    that user's last event. The emitted frame equals batch
    _competing_durations exactly, so the Aalen-Johansen readout is the
    shared _cr_readout batch fold."""
    return events.groupBy("user_id").applyInPandasWithState(
        _competing_update,
        outputStructType=CR_OUTPUT_SCHEMA,
        stateStructType=CR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
