"""Custom stateful streaming operator via ``applyInPandasWithState``.

``session_window``/``window`` cover the declarative cases; this module
is the escape hatch for state machines Spark's built-ins can't express
— per-key running aggregates that must survive across micro-batches
with custom update logic. The example operator keeps a per-user
lifetime counter + value total and emits one updated row per user per
micro-batch; swap the update function for fraud scoring, cumulative
token budgets, or per-source dedup memories without touching the
plumbing.

State lives in the state store keyed by ``user_id``; a processing-time
timeout (``GroupStateTimeout.NoTimeout`` here — counters are lifetime)
is where an eviction policy would plug in. At 100 TB the state store is
the scaling limit: key cardinality × state row size must fit the
cluster's aggregate state budget, which is why production operators set
timeouts or watermark-based eviction.

Batch-mode twin for tests/oracle thinking: a plain groupBy count/sum
over all data seen so far equals the final state after draining.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "running_user_totals",
    "running_heavy_hitters",
    "HEAVY_HITTERS_SCHEMA",
    "USER_TOTALS_SCHEMA",
    "running_transitions",
    "TRANSITIONS_SCHEMA",
]

USER_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        # float sum here is per-key accumulation state, not an
        # oracle-compared output — plain pandas sum is fine.
        total += float(pdf["value"].sum())
    state.update((n, round(total, 2)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime (event count, value total), updated each
    micro-batch. Works on a streaming DataFrame; the grouping shuffle is
    the only exchange and state co-locates with it."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITIONS_SCHEMA = T.StructType(
    [
        T.StructField("prev_event", T.StringType()),
        T.StructField("next_event", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)

_LAST_EVENT_SCHEMA = T.StructType(
    [T.StructField("last_event", T.StringType())]
)


def _transitions_update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last = state.get[0] if state.exists else None
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts", "event_id"])
    counts: dict[tuple[str, str], int] = {}
    prev = last
    for et in rows["event_type"]:
        if prev is not None:
            counts[(prev, et)] = counts.get((prev, et), 0) + 1
        prev = et
    state.update((prev,))
    if counts:
        yield pd.DataFrame(
            [
                {"prev_event": a, "next_event": b, "n": c}
                for (a, b), c in counts.items()
            ]
        )


def running_transitions(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch
    :func:`~tmdb_index_spark.operators.temporal.transition_matrix`:
    per micro-batch, the DELTA of (prev → next) event-type transition
    counts per user, with the user's last event carried in the state
    store so transitions spanning micro-batch boundaries are counted
    exactly once. Summing the emitted deltas over a drained stream
    equals the batch transition counts — the parity property
    `tests/test_streaming.py` pins.

    Ordering contract: rows are ordered by (ts, event_id) WITHIN each
    micro-batch; across batches the operator assumes per-key
    in-order delivery (true for replayed logs / file sources). For
    out-of-order live streams, put a watermark + sort-within-batch
    stage in front, or transitions at batch boundaries may invert.

    State per key is one string (the last event type) — the minimal
    footprint for this semantics; the grouping shuffle co-locates
    state with data, like every `applyInPandasWithState` operator.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _transitions_update,
        outputStructType=TRANSITIONS_SCHEMA,
        stateStructType=_LAST_EVENT_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HEAVY_HITTERS_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("count_lb", T.LongType()),
        T.StructField("err", T.LongType()),
    ]
)

_HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("users", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("err", T.LongType()),
    ]
)


def _hh_update_factory(capacity: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        users, counts, err = (
            state.get if state.exists else ([], [], 0)
        )
        summary = dict(zip(list(users), list(counts)))
        for pdf in pdfs:
            for u, c in pdf["user_id"].value_counts().items():
                summary[int(u)] = summary.get(int(u), 0) + int(c)
        if len(summary) > capacity:
            # mergeable-summaries shrink (Agarwal et al. 2012): subtract
            # the (capacity+1)-th largest count from everything and drop
            # the non-positive rest — one deterministic pass, ties
            # broken on the lower user id
            items = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
            t = items[capacity][1]
            summary = {u: c - t for u, c in items if c - t > 0}
            err += t
        items = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
        state.update(
            ([u for u, _ in items], [c for _, c in items], int(err))
        )
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(items),
                "user_id": [u for u, _ in items],
                "count_lb": [c for _, c in items],
                "err": [int(err)] * len(items),
            }
        )

    return update


def running_heavy_hitters(events: DataFrame, capacity: int = 8) -> DataFrame:
    """Streaming Misra–Gries heavy hitters per event type (Misra &
    Gries 1982; merged across micro-batches via the Agarwal et al.
    2012 mergeable-summaries rule): at most ``capacity`` candidate
    counters per key survive in the state store — CONSTANT state per
    key however many distinct users flow past, the property that makes
    frequency tracking viable at stream scale where an exact per-user
    count table would grow without bound. Per micro-batch each group
    emits its current candidate set with the summary's error offset;
    the deterministic contract (exact per-batch pandas counts, the
    (c+1)-th-largest subtraction, ties to the lower user id) makes
    every emission reproducible, and the classic guarantees hold at
    drain: ``count_lb ≤ true ≤ count_lb + err`` for emitted users, and
    every user with ``true > err`` is present in the final summary."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    return events.groupBy("event_type").applyInPandasWithState(
        _hh_update_factory(capacity),
        outputStructType=HEAVY_HITTERS_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
