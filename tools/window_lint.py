"""Pre-flight "will this window funnel?" lint (round-7 VERDICT #9).

Walks a query's EXECUTED physical plan and flags WindowExec nodes that
would serialize data-proportional work at scale — the two hazard
shapes this repo has repeatedly found by hand:

1. **Global funnel**: an unpartitioned window (empty partitionSpec →
   ``Exchange SinglePartition``) whose input is data-proportional —
   every row through ONE task (round-6: ``user_rfm_segments``,
   ``conversion_gains_table``, ``purchase_value_ks_test``).
2. **Few-huge-groups**: a window partitioned ONLY by dimension-bounded
   keys (25 nations) over per-data-key rollups — group COUNT is
   bounded but each group's SIZE is data-proportional (round-6:
   ``nation_spend_gini``; round-5: ``weighted_percentile``'s first
   spelling).

"Data-proportional" is decided by the nearest aggregate(s) BELOW the
window: no aggregate at all above a parquet scan → the frame is the
table itself; an aggregate grouping by any known data-scale key
(user/customer/order/doc/vec ids, raw values) → the rollup grows with
data. Aggregates grouping only by calendar functions, dim keys, or
derived bounded tags (buckets, deciles, flags) are bounded — their
windows may legally run unpartitioned.

Heuristic by design: the key lists below name THIS repo's schemas.
A window partitioned by any data-scale key (per-user sessions) or by
a quantized ``__bkt__`` (the grouped_rank rewrite — balanced by
construction via quantile cuts) passes. The lint would have caught
all four round-6 weak queries and flags nothing in the current
catalog (``tests/test_plans.py::test_catalog_window_funnel_lint``).
"""

from __future__ import annotations

import re

#: Columns whose distinct-count grows with the data volume. Grouping
#: by any of these keeps the frame data-proportional; partitioning a
#: window by any of these spreads it (group count scales out).
DATA_KEYS = {
    "user_id", "event_id", "doc_id", "vec_id", "session_id",
    "c_custkey", "o_custkey", "custkey", "s_suppkey", "l_suppkey",
    "suppkey", "o_orderkey", "l_orderkey", "orderkey", "p_partkey",
    "l_partkey", "partkey", "id", "value", "ts",
    # common derived aliases for raw values/ids in this repo's queries
    "__v__", "__slope__", "__x__", "__score__", "__shufkey__",
    # per-entity aliases used by the ANN / pair / graph families —
    # windows PARTITIONED by these scale out (group count grows with
    # data); frames GROUPED by them stay data-proportional
    "query_id", "neighbor_id", "part_a", "part_b", "id_a", "id_b",
    "component", "__h__", "__id__",
}

#: Partition keys that are balanced-by-construction even though their
#: cardinality is bounded: the quantized sort-key bucket of
#: grouped_rank/grouped_ntile/grouped_prefix_sum (quantile cuts keep
#: per-bucket row counts ~N/buckets for any key distribution).
BALANCED_TAGS = {"__bkt__", "__pid__", "__shard__"}


def _is_balanced_tag(name: str) -> bool:
    """``__bkt__`` is also a reserved PREFIX: grouped_ntile_multi tags
    one bucket column per ordering spec (``__bkt__0``, ``__bkt__1``,
    …), each quantile-balanced by the same construction."""
    return name in BALANCED_TAGS or name.startswith("__bkt__")

_CALENDAR_FNS = re.compile(
    r"date_trunc|\byear\(|\bmonth\(|\bquarter\(|\bdayofweek\(|\bhour\(|"
    r"\bwindow\(|to_date|weekofyear"
)


def _name_of(expr_str: str) -> str:
    """'user_id#123L' / 'cast(user_id#12 as ...)' → base column name."""
    m = re.search(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", expr_str)
    return m.group(1) if m else expr_str


def _cached_plan(node):
    """The physical plan an ``InMemoryTableScanExec`` reads, or None
    when the JVM shape is unreadable (plan-API drift)."""
    try:
        return node.relation().cachedPlan()
    except Exception:
        return None


def _children(node):
    cls = node.getClass().getSimpleName()
    # AQE and query-stage wrappers hide their subtree from children()
    if cls == "AdaptiveSparkPlanExec":
        return [node.initialPlan()]
    if cls.endswith("QueryStageExec"):
        return [node.plan()]
    if cls == "ReusedExchangeExec":
        return [node.child()]
    if cls == "InMemoryTableScanExec":
        # A cache substitution (a pin, the caller's own or one leaked
        # from an earlier build in the same session — the round-13 red
        # gate) must not hide the frame it pinned: judge the CACHED
        # plan, both for boundedness and for funnels inside it.
        cp = _cached_plan(node)
        return [cp] if cp is not None else []
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _seq_strs(seq) -> list[str]:
    return [seq.apply(i).toString() for i in range(seq.size())]


def _is_aggregate(cls: str) -> bool:
    return cls in (
        "HashAggregateExec",
        "ObjectHashAggregateExec",
        "SortAggregateExec",
    )


def _input_is_data_proportional(node) -> bool:
    """True if the frame feeding ``node`` grows with data volume:
    descend until the nearest aggregate(s); an aggregate bounds the
    frame unless it groups by a data-scale key; a scan with no
    aggregate above it is the raw table. Joins/unions combine by OR
    (any data-proportional input keeps the frame data-proportional;
    broadcast-side bounded frames don't save it)."""
    cls = node.getClass().getSimpleName()
    if _is_aggregate(cls):
        keys = [_name_of(s) for s in _seq_strs(node.groupingExpressions())]
        if not keys:  # global aggregate → 1 row
            return False
        key_strs = _seq_strs(node.groupingExpressions())
        if any(k in DATA_KEYS for k in keys) and not all(
            _CALENDAR_FNS.search(s) for s in key_strs
        ):
            return True
        return False
    if cls == "WindowGroupLimitExec" or "Limit" in cls or (
        cls == "TakeOrderedAndProjectExec"
    ):
        # rank-limit pushdown / limits: at most k rows per group (or k
        # total for TakeOrderedAndProject and the Limit family) flow
        # upward — the documented top-k pattern. The downstream window
        # sorts k·P rows, not data.
        return False
    if "InMemoryTableScan" in cls:
        # pinned frame: boundedness is a property of the plan BENEATH
        # the cache, not of the cache itself — a pinned calendar
        # rollup stays bounded (round-13 false alarm:
        # conformal_revenue_interval flagged because a leaked pin from
        # rolling_backtest_mae substituted an InMemoryTableScan for
        # its bounded daily aggregate). Unreadable cache → raw-scan
        # conservative.
        cp = _cached_plan(node)
        if cp is None:
            return True
        return _input_is_data_proportional(cp)
    if cls == "LocalTableScanExec":
        # driver-local literal relation (createDataFrame of built
        # literals — e.g. the advisor's 3-row cost table): its rows
        # were materialized on the driver at plan-build time, so the
        # frame is bounded by construction. Data-proportional rows
        # can only reach a local relation through a driver collect,
        # which bounded_collect polices separately.
        return False
    if "Scan" in cls:
        return True  # raw table
    kids = _children(node)
    if not kids:
        # leaf that isn't a scan: range, local relation, reused
        # exchange/subquery — treat ReusedExchange conservatively
        return "Reused" in cls
    return any(_input_is_data_proportional(k) for k in kids)


def audit_window_funnels(df) -> list[str]:
    """Return one finding string per hazardous WindowExec in ``df``'s
    executed plan; empty list = no funnels."""
    findings: list[str] = []
    root = df._jdf.queryExecution().executedPlan()

    def walk(node):
        cls = node.getClass().getSimpleName()
        # WindowGroupLimitExec itself never exchanges — it is the
        # per-partition bounding operator — so only WindowExec can
        # funnel.
        if cls == "WindowExec":
            part = _seq_strs(node.partitionSpec())
            names = {_name_of(p) for p in part}
            data_prop = any(
                _input_is_data_proportional(k) for k in _children(node)
            )
            if data_prop:
                if not names:
                    findings.append(
                        f"unpartitioned {cls} over data-proportional frame"
                    )
                elif not (names & DATA_KEYS) and not any(
                    _is_balanced_tag(n) for n in names
                ):
                    findings.append(
                        f"{cls} partitioned only by bounded keys "
                        f"{sorted(names)} over data-proportional frame"
                    )
        for k in _children(node):
            walk(k)

    walk(root)
    return findings
