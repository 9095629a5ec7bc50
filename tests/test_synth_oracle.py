"""Synthetic stream + oracle self-checks, incl. the SQL⇄Python lockstep
that underpins the driver's DuckDB correctness gate."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from nifi_processors_ray.oracle import apply_changelog, split_valid
from nifi_processors_ray.synth import (
    CHANGELOG_FROM_EVENTS_CTE,
    derive_changelog_from_events,
    generate_changelog,
)

SF_DIR = "/root/testdata/sf0.001"


def test_derivation_matches_sql_cte():
    ev = pq.read_table(f"{SF_DIR}/events.parquet")
    py = derive_changelog_from_events(ev).sort_by("seq")
    con = duckdb.connect()
    con.register("events", ev)
    sql = con.sql(f"WITH {CHANGELOG_FROM_EVENTS_CTE} SELECT * FROM _ch ORDER BY seq").arrow()
    assert py.equals(sql.cast(py.schema))


def test_derivation_scenario_coverage():
    ev = pq.read_table(f"{SF_DIR}/events.parquet")
    ch = derive_changelog_from_events(ev)
    ops = set(ch.column("op").to_pylist())
    assert ops == {"I", "U", "D"}
    valid, rejected = split_valid(ch)
    assert rejected.num_rows > 0
    reasons = set(rejected.column("reject_reason").to_pylist())
    assert {"null_conv_id", "bad_turn_idx", "null_payload"} <= reasons
    # hot conversation exists
    import collections

    counts = collections.Counter(c for c in valid.column("conv_id").to_pylist())
    assert counts["c0"] > 3 * sorted(counts.values())[len(counts) // 2]


def test_generator_deterministic():
    a = generate_changelog(5000, seed=3)
    b = generate_changelog(5000, seed=3)
    assert a.equals(b)
    c = generate_changelog(5000, seed=4)
    assert not a.equals(c)


def test_oracle_lww_semantics():
    ch = generate_changelog(10_000, n_convs=50, seed=1)
    final = apply_changelog(ch)
    # keys unique
    keys = list(zip(final.column("conv_id").to_pylist(), final.column("turn_idx").to_pylist()))
    assert len(keys) == len(set(keys))
    # stable ordering
    assert keys == sorted(keys)
