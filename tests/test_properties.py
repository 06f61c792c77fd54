"""Property-based tests (hypothesis) for the upsert core's algebraic
invariants — beyond the reference's example-based strategy (SURVEY.md
§5: "our plan" adds property tests where the operator has an algebra).

Spark jobs per example are expensive; examples are capped and frames
kept tiny — the value is in the randomized STRUCTURE (overlapping /
disjoint / duplicate-free id sets, null patterns), not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import rows
from tmdb_index_spark.operators.upsert import (
    align_id_col,
    update_or_append,
    update_or_append_join,
)

# Frames: unique small ids, nullable string + long payloads.
_frame = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.one_of(st.none(), st.text(alphabet="abc", max_size=3)),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    ),
    max_size=8,
    unique_by=lambda r: r[0],
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, data):
    return spark.createDataFrame(data, "id long, v string, x long")


@given(old=_frame, batch=_frame)
@_SETTINGS
def test_window_and_join_upserts_agree(spark, old, batch):
    a = rows(update_or_append(_df(spark, old), _df(spark, batch)))
    b = rows(update_or_append_join(_df(spark, old), _df(spark, batch)))
    assert a == b


@given(old=_frame, batch=_frame)
@_SETTINGS
def test_upsert_idempotent(spark, old, batch):
    once = update_or_append(_df(spark, old), _df(spark, batch))
    twice = update_or_append(once, _df(spark, batch))
    assert rows(once) == rows(twice)


@given(old=_frame, batch=_frame)
@_SETTINGS
def test_upsert_keys_are_union_and_batch_wins(spark, old, batch):
    out = rows(update_or_append(_df(spark, old), _df(spark, batch)))
    assert [r["id"] for r in out] == sorted({r[0] for r in old} | {r[0] for r in batch})
    by_id = {r["id"]: r for r in out}
    for bid, bv, bx in batch:
        assert by_id[bid]["v"] == bv and by_id[bid]["x"] == bx


@given(data=_frame)
@_SETTINGS
def test_align_is_dense_and_idempotent(spark, data):
    aligned = align_id_col(_df(spark, data))
    got = rows(aligned)
    if not data:
        assert got == []
        return
    assert [r["id"] for r in got] == list(range(max(r[0] for r in data) + 1))
    assert rows(align_id_col(aligned)) == got
