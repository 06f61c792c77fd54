"""Oracle window ORDER BY tie-stability lint (round-8 VERDICT #2).

The defect class this guards: a DuckDB oracle that evaluates TWO OR
MORE window passes over the same logical ordering (e.g. a break-flag
pass and a running-SUM-of-flags pass) re-sorts the input
independently per pass with a PARALLEL, NON-STABLE sort. If the
ORDER BY is not a total order (duplicate rows can tie), the two
passes can disagree on tie order, attaching one pass's outputs to
the other pass's neighbours — caught live on
``supplier_busy_intervals`` at sf0.1 (3/1000 suppliers with
``busy_seconds`` inflated 8-9 days; single-threaded DuckDB equals
Spark exactly). Spark itself is immune *within* one lineage: stacked
WindowExec nodes share one partitioning + one physical row order, so
tie order is internally consistent (the single-sort invariant,
documented on ``operators/temporal.merge_intervals``).

The durable gate: every window ORDER BY in every static oracle SQL
must end in a key that is UNIQUE within its partition — either a
catalog-wide unique identifier (``UNIQUE_TRAILING_KEYS``) or a
per-query waiver (``WAIVERS``) recording WHY the clause is tie-free
or tie-stable (input pre-grouped on the order keys; rank-family
functions that assign tied rows identical values). A new oracle with
a tying ORDER BY fails ``tests/test_plans.py`` until it carries a
tiebreak or a justified waiver.

Heuristic by design (regex over SQL, not a parser) — it names THIS
repo's schemas and conventions, same stance as ``window_lint.py``.
"""

from __future__ import annotations

import re

__all__ = ["audit_oracle_order_keys", "UNIQUE_TRAILING_KEYS", "WAIVERS"]

#: Trailing ORDER BY keys that are unique within every window
#: partition this catalog uses them in (so any ORDER BY ending in one
#: is a total order per partition):
#:  - event_id / doc_id / vec_id / o_orderkey / c_custkey / s_suppkey
#:    / p_partkey: primary keys of their tables.
#:  - user_id: only a trailing key over PER-USER rollups (one row per
#:    user), never over raw events.
#:  - run: the per-user run counter of the SCD2 builds — strictly
#:    increasing per user in the ``versions`` rollup it orders.
#:  - neighbor_id / cell / ccell / code: unique per query-vector (or
#:    per (vec_id, sub)) partition in the ANN oracles (one candidate
#:    row per neighbor/cell; one codebook row per (sub, code) in the
#:    PQ encoding argmin).
#:  - source / term / part_b / seg_id / n_name: grouping keys of the
#:    rollup each orders (one row per value within the partition;
#:    n_name is the nation primary name over per-nation rollups).
#: ``rn`` is deliberately NOT here: a ROW_NUMBER alias is only unique
#: within the partition it was COMPUTED over, so an ORDER BY ending in
#: ``rn`` is verified structurally instead — the consuming clause's
#: PARTITION BY must match some ROW_NUMBER() window's PARTITION BY in
#: the same oracle (round-9 ADVICE: a global key here would silently
#: waive future mismatched-partition uses).
UNIQUE_TRAILING_KEYS = {
    "event_id", "doc_id", "vec_id", "o_orderkey", "c_custkey",
    "s_suppkey", "p_partkey", "user_id", "run", "neighbor_id",
    "cell", "ccell", "code", "source", "term", "part_b", "seg_id",
    "n_name",
}

#: Per-oracle waivers: (query name, trailing key) → why the clause
#: cannot produce the cross-pass tie instability. Two safe shapes:
#:  - "grouped-unique": the window's input CTE GROUPs BY the full
#:    ORDER BY key list (within the partition), so the order is total
#:    by construction.
#:  - "tie-stable fn": the only window functions over the clause are
#:    rank-family (PERCENT_RANK / CUME_DIST / RANK / DENSE_RANK) or
#:    frame aggregates whose grouped result is tie-order invariant,
#:    AND no second pass consumes per-row outputs positionally.
WAIVERS = {
    ("ann_index_advisor", "index_name"):
        "grouped-unique: the decision window's input joins one "
        "1-row aggregate per family (each tagged a DISTINCT literal "
        "index_name) to a VALUES cost row per family — index_name is "
        "unique across the 3-row frame by construction; single pass",
    ("cohort_ltv_curves", "age_weeks"):
        "grouped-unique: cells GROUP BY (cohort_week, age_weeks)",
    ("conversion_gains_table", "decile"):
        "grouped-unique: by_decile GROUP BY decile",
    ("cumulative_daily_revenue", "day"):
        "grouped-unique: daily rollup GROUP BY day",
    ("conformal_revenue_interval", "day"):
        "grouped-unique: cal_r rows come from the daily rollup "
        "(GROUP BY day), one row per day",
    ("signup_psm_att", "cs"):
        "grouped-unique: c_cells GROUPs BY clicks, one row per cs "
        "within every t.ts partition of the match cross",
    ("moving_avg_daily_value", "day"):
        "grouped-unique: daily rollup GROUP BY day",
    ("forecast_accuracy", "day"):
        "grouped-unique: daily rollup GROUP BY day",
    ("gap_fill_locf", "day"):
        "grouped-unique: calendar spine is one row per day",
    ("daily_value_anomalies", "x_day"):
        "grouped-unique: daily GROUP BY (event_type, x_day)",
    ("revenue_changepoints", "x"):
        "grouped-unique: daily GROUP BY (event_type, x)",
    ("purchase_value_ks_test", "v"):
        "grouped-unique: per_val GROUP BY v",
    ("purchase_mannwhitney", "v"):
        "grouped-unique: per_val GROUP BY v",
    ("weighted_median_price", "v"):
        "single pass; MIN(v) over threshold-passing rows is "
        "tie-order invariant (max cum per value group is fixed)",
    ("signup_conversion_survival", "t_hours"):
        "grouped-unique: bytime GROUP BY t_hours",
    ("price_size_frontier", "size"):
        "grouped-unique: pairs GROUP BY (price, size); ORDER BY is "
        "the full grouping tuple",
    ("supplier_busy_intervals", "end_ts"):
        "grouped-unique: iv GROUP BY (l_suppkey, start_ts, end_ts) "
        "— the r8 fix for the live instance of this defect class",
    ("value_rank_dist", "value"):
        "tie-stable fn: PERCENT_RANK/CUME_DIST give tied rows "
        "identical values; single pass, grouped sums invariant",
    ("exact_substr_spans", "pos"):
        "unique by construction: the pos CTE emits one k-gram row per "
        "(doc_id, pos) and dup only equi-joins it to counts, so pos "
        "is unique within every doc_id window partition of both the "
        "break-flag and running-sum passes",
    ("exact_substr_char_spans", "pos"):
        "unique by construction: same shape as exact_substr_spans — "
        "the pos CTE emits one 16-char-window row per (doc_id, pos) "
        "and dup only equi-joins it to counts, so pos is unique "
        "within every doc_id window partition",
    ("upsert_keep_last", "prec"):
        "unique by construction: each id has at most one row per "
        "prec value (base UNION ALL filtered-updates)",
    ("nation_spend_gini", "c_custkey"):
        "unique: one row per customer in the per-customer rollup",
    ("backfill_topk", "c_custkey"):
        "unique: customer primary key",
    ("customer_first_last_order", "o_orderkey"):
        "unique: orders primary key",
    ("refresh_topk", "o_orderkey"):
        "unique: orders primary key",
    ("top_supplier_per_nation", "s_suppkey"):
        "unique: supplier primary key",
    ("dedup_canonical_map", "doc_id"):
        "unique: documents primary key",
}

_CLAUSE_RE = re.compile(
    r"(?:OVER|WINDOW\s+\w+\s+AS)\s*\(([^()]*(?:\([^()]*\)[^()]*)*)\)",
    re.I,
)
_ORDER_RE = re.compile(
    r"ORDER\s+BY\s+(.*?)(?:\bROWS\b|\bRANGE\b|$)", re.I | re.S
)
_PARTITION_RE = re.compile(
    r"PARTITION\s+BY\s+(.*?)(?:ORDER\s+BY|\bROWS\b|\bRANGE\b|$)",
    re.I | re.S,
)
_ROW_NUMBER_RE = re.compile(
    r"ROW_NUMBER\s*\(\s*\)\s*OVER\s*\(([^()]*(?:\([^()]*\)[^()]*)*)\)",
    re.I,
)


def _partition_cols(clause: str) -> tuple[str, ...]:
    """Normalized PARTITION BY column tuple of a window clause
    ('' partition → empty tuple); alias qualifiers stripped."""
    m = _PARTITION_RE.search(clause)
    if not m:
        return ()
    cols = [c.strip() for c in m.group(1).split(",") if c.strip()]
    return tuple(sorted(c.rsplit(".", 1)[-1].lower() for c in cols))


def _row_number_partitions(sql: str) -> set[tuple[str, ...]]:
    """PARTITION BY signatures of every ROW_NUMBER() window in the
    oracle — a trailing ``rn`` key is total-order-safe iff the
    consuming clause partitions identically to one of these."""
    return {_partition_cols(c) for c in _ROW_NUMBER_RE.findall(sql)}


def _trailing_key(order_expr: str) -> str:
    """Last ORDER BY key, stripped of direction, CAST and alias
    qualifier: 'CAST(m AS DOUBLE) ASC, user_id ASC' → 'user_id';
    'c.doc_id' → 'doc_id'."""
    keys = [k.strip() for k in order_expr.split(",") if k.strip()]
    last = re.sub(r"\s+(ASC|DESC)\s*$", "", keys[-1], flags=re.I).strip()
    last = re.sub(
        r"^CAST\s*\((.*?)\s+AS\s+[\w()\s,]+\)$", r"\1", last, flags=re.I
    ).strip()
    return last.rsplit(".", 1)[-1].lower()


def audit_oracle_order_keys(oracles: dict[str, str]) -> list[str]:
    """One finding string per window ORDER BY whose trailing key is
    neither catalog-unique nor waived; empty list = lint clean."""
    findings: list[str] = []
    for name in sorted(oracles):
        sql = oracles[name]
        if not isinstance(sql, str):
            continue
        for clause in _CLAUSE_RE.findall(sql):
            m = _ORDER_RE.search(clause)
            if not m:
                continue  # orderless window: whole-partition agg,
                # order-insensitive by definition
            key = _trailing_key(m.group(1))
            if key in UNIQUE_TRAILING_KEYS:
                continue
            if (name, key) in WAIVERS:
                continue
            if key == "rn":
                # structural check: unique iff the consuming clause
                # partitions exactly like the ROW_NUMBER that made it
                if _partition_cols(clause) in _row_number_partitions(sql):
                    continue
                findings.append(
                    f"{name}: window ORDER BY ends in 'rn' but its "
                    f"PARTITION BY {_partition_cols(clause)} matches "
                    f"no ROW_NUMBER() window in the oracle — rn is "
                    f"only unique within the partition that computed it"
                )
                continue
            findings.append(
                f"{name}: window ORDER BY ends in non-unique key "
                f"{key!r} with no waiver — a stacked pass over this "
                f"ordering can tie-swap (see supplier_busy_intervals)"
            )
    return findings


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    found = audit_oracle_order_keys(entry.oracle_sql())
    for f in found:
        print("FLAG", f)
    print("ALL CLEAN" if not found else f"{len(found)} findings")
    sys.exit(1 if found else 0)
