"""Pin-hygiene lint (round-13 VERDICT #1/#7): building a catalog query
must not leave session state the standing gates cannot clear.

Every gate that iterates the catalog (bench, stress_scale, the
window-funnel test loop, check_oracle) resets between queries with the
same recipe — ``release_pins()`` + ``spark.catalog.clearCache()`` —
so a build-time ``pin_frame`` is legal exactly because the ledger
scopes it to that reset. The defect class this lint makes structural
(the way round 9 did for oracle ORDER BY ties): a cache/persist that
BYPASSES the ledger. ``clearCache`` still sweeps catalog-cache
entries, but an unledgered ``localCheckpoint`` (or a raw
``rdd.persist``) registers a persistent RDD the scoped
``release_pins`` cannot see and ``clearCache`` does not touch — its
blocks then accumulate across the whole session, and any later query
sharing the subtree silently audits/benches a substituted plan
(round-13's red window-funnel gate).

Invariant checked per query: after ``reset_session_pins``, the
SparkContext's persistent-RDD registry is EMPTY. Teeth:
``tests/test_plans.py::test_pin_lint_teeth`` plants an unledgered
checkpoint and asserts the lint flags it (and that a ledgered
``pin_frame`` does not).

Usage: PYTHONPATH=/root/repo python tools/pin_lint.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys


def reset_session_pins(spark) -> None:
    """The standing-gate reset: free every ledgered pin (cache blocks,
    checkpoint RDDs, parquet scratch), then sweep the catalog cache so
    no earlier build's cached plan substitutes into the next query's
    physical plan."""
    from tmdb_index_spark.operators.materialize import release_pins

    release_pins()
    spark.catalog.clearCache()


def build_pin_leaks(spark) -> list[str]:
    """Run the standing-gate reset, then report persistence the reset
    could NOT clear — one finding string per surviving persistent RDD.
    Empty list = the build was pin-hygienic."""
    reset_session_pins(spark)
    findings: list[str] = []
    jrdds = spark.sparkContext._jsc.getPersistentRDDs()
    for rid, jrdd in jrdds.items():
        findings.append(
            f"persistent RDD id={rid} ({jrdd.name() or jrdd.toString()[:80]}) "
            f"survives release_pins+clearCache — pinned outside the ledger"
        )
    return findings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from tmdb_index_spark.queries import QUERIES
    from tmdb_index_spark.session import get_spark

    spark = get_spark("pin-lint")
    bad = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        reset_session_pins(spark)
        try:
            fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            bad[name] = [f"build error: {str(e)[:200]}"]
            continue
        leaks = build_pin_leaks(spark)
        if leaks:
            bad[name] = leaks
            print(f"LEAK {name}: {leaks}")
        else:
            print(f"ok   {name}")
    reset_session_pins(spark)
    print(f"\n{'PIN LINT CLEAN' if not bad else 'LEAKS: ' + ', '.join(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
