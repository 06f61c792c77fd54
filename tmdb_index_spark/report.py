"""Markdown run report (SURVEY.md §2.1 S8, §2.6 C7-C9).

Mirrors the reference's GitHub step summary (``format_gh_step_summary``,
tmdb_index.py:571-600): a markdown stats table + shape/changes/rss
lines.  The stats DataFrame is tiny (one row per column) — collecting it
to the driver for rendering is the correct plan.

Deltas vs the reference's golden string (test_tmdb_index.py:797-827):
dtype names are Spark's (``bigint`` not ``u32``) and ``rss`` is a
schema-based size estimate (Spark has no ``estimated_size``); layout,
header row, and number formatting are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tmdb_index_spark.operators.diff import change_summary
from tmdb_index_spark.operators.stats import compute_stats
from tmdb_index_spark.operators.upsert import validate_id

__all__ = ["format_gh_step_summary", "render_markdown_table", "estimated_size_mb"]

_FIXED_WIDTHS = {
    "bigint": 8,
    "int": 4,
    "smallint": 2,
    "tinyint": 1,
    "double": 8,
    "float": 4,
    "boolean": 1,
    "date": 4,
    "timestamp": 8,
}


def estimated_size_mb(df: DataFrame) -> float:
    """Schema-based in-memory size estimate in MB: fixed widths per
    primitive type, summed byte lengths for strings/binary.  One
    aggregate pass; an estimate (like the reference's
    ``estimated_size``, tmdb_index.py:598), not an accounting."""
    aggs = [F.count(F.lit(1)).alias("__n__")]
    str_cols = []
    for name, dtype in df.dtypes:
        if dtype in ("string", "binary"):
            str_cols.append(name)
            aggs.append(F.sum(F.length(F.col(name))).alias(f"len__{name}"))
    row = df.agg(*aggs).collect()[0].asDict()
    n = row["__n__"]
    total = 0.0
    for name, dtype in df.dtypes:
        if name in str_cols:
            total += float(row[f"len__{name}"] or 0)
        else:
            total += _FIXED_WIDTHS.get(dtype, 8) * n
    return total / (1024 * 1024)


def render_markdown_table(rows: list[dict[str, str]], columns: list[str]) -> str:
    """Polars ASCII_MARKDOWN-style table: ``(str)``-suffixed headers,
    cells padded to column width (layout of the reference's golden
    output, test_tmdb_index.py:812-817)."""
    headers = [f"{c} (str)" for c in columns]
    widths = [
        max(len(h), *(len(r.get(c, "")) for r in rows)) if rows else len(h)
        for c, h in zip(columns, headers)
    ]
    out = []
    out.append("| " + " | ".join(h.ljust(w) for h, w in zip(headers, widths)) + " |")
    out.append("|" + "|".join("-" * (w + 2) for w in widths) + "|")
    for r in rows:
        out.append(
            "| "
            + " | ".join(r.get(c, "").ljust(w) for c, w in zip(columns, widths))
            + " |"
        )
    return "\n".join(out)


def format_gh_step_summary(df_old: DataFrame, df_new: DataFrame, filename: str) -> str:
    """Render the run report (reference tmdb_index.py:571-600).
    Validates both ids first, like the reference."""
    validate_id(df_old)
    validate_id(df_new)

    stats_rows = [r.asDict() for r in compute_stats(df_old, df_new).collect()]
    added, removed, updated = change_summary(df_old, df_new)
    n_rows = df_new.count()
    n_cols = len(df_new.columns)
    rss = estimated_size_mb(df_new)

    table = render_markdown_table(
        stats_rows,
        ["name", "dtype", "null", "true", "false", "unique", "updated"],
    )
    return (
        f"## {filename}\n"
        "\n"
        f"{table}\n"
        "\n"
        f"shape: ({n_rows:,}, {n_cols:,})\n"
        f"changes: +{added:,} -{removed:,} ~{updated:,}\n"
        f"rss: {rss:,.1f}MB\n"
    )
