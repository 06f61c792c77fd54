"""Golden-output test for the markdown run report (mirrors the
reference's ``test_format_gh_step_summary``, test_tmdb_index.py:797-827
— exact-string match; dtype names and rss estimation are documented
deltas, SURVEY.md §1.3)."""

from __future__ import annotations

from datetime import date

from tmdb_index_spark.report import (
    estimated_size_mb,
    format_gh_step_summary,
    render_markdown_table,
)


def _frames(spark):
    old = spark.createDataFrame(
        [(0, True, date(2024, 5, 1)), (1, None, None)],
        "id long, adult boolean, date date",
    )
    new = spark.createDataFrame(
        [
            (0, True, date(2024, 5, 1)),
            (1, False, date(2024, 5, 2)),
            (2, None, None),
        ],
        "id long, adult boolean, date date",
    )
    return old, new


def test_golden_step_summary(spark):
    old, new = _frames(spark)
    got = format_gh_step_summary(old, new, "movie.parquet")
    expected = (
        "## movie.parquet\n"
        "\n"
        "| name (str) | dtype (str) | null (str) | true (str) | false (str) | unique (str) | updated (str) |\n"
        "|------------|-------------|------------|------------|-------------|--------------|---------------|\n"
        # adult is 'unique': n_unique counts null as a distinct value
        # (Polars semantics, reference tmdb_index.py:160); 'updated' uses
        # null-propagating != (P12), so None->False transitions don't count.
        "| id         | bigint      |            |            |             | true         |               |\n"
        "| adult      | boolean     | 1 (33.3%)  | 1 (33.3%)  | 1 (33.3%)   | true         |               |\n"
        "| date       | date        | 1 (33.3%)  |            |             | true         |               |\n"
        "\n"
        "shape: (3, 3)\n"
        "changes: +1 -0 ~1\n"
        "rss: 0.0MB\n"
    )
    assert got == expected


def test_render_markdown_table_empty_rows():
    out = render_markdown_table([], ["name", "dtype"])
    assert out.splitlines()[0] == "| name (str) | dtype (str) |"
    assert len(out.splitlines()) == 2


def test_estimated_size_counts_strings(spark):
    df = spark.createDataFrame([(0, "abcd")], "id long, s string")
    mb = estimated_size_mb(df)
    assert 0 < mb < 1
    assert abs(mb * 1024 * 1024 - (8 + 4)) < 1e-6
