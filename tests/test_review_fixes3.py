"""Regression tests for round-2 review findings (VERDICT r1 / ADVICE r1)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_simhash_null_and_empty_text_isolated():
    """ADVICE r1 (high): a doc immediately preceding a null-text doc must
    keep its full signature — the old reduceat guard collapsed it to its
    first token, so identical docs straddling a null failed to pair."""
    from nifi_processors_ray.ops.dedup import simhash_signatures

    doc = "alpha beta gamma delta epsilon"
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([doc, None, doc]),
        }
    )
    rows = simhash_signatures(batch).to_pylist()
    # identical docs → identical simhash regardless of batch composition
    assert rows[0]["simhash"] == rows[2]["simhash"]

    # signature must equal the one computed with NO null neighbors
    solo = simhash_signatures(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array([doc])})
    ).to_pylist()
    assert rows[0]["simhash"] == solo[0]["simhash"]

    # null and empty docs share the documented simhash-0 contract
    batch2 = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([None, "", None]),
        }
    )
    sigs2 = simhash_signatures(batch2).to_pylist()
    assert [r["simhash"] for r in sigs2] == [0, 0, 0]

    # all-null and fully empty batches don't crash
    assert (
        simhash_signatures(
            pa.table({"doc_id": pa.array([9], pa.int64()), "text": pa.array([None], pa.string())})
        ).num_rows
        == 1
    )
    assert (
        simhash_signatures(
            pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
        ).num_rows
        == 0
    )


def test_simhash_pairs_survive_null_neighbor(ray_session):
    """End-to-end: identical docs separated by a null doc still pair."""
    import ray.data

    from nifi_processors_ray.ops.dedup import simhash_dup_pairs

    doc = "alpha beta gamma delta epsilon zeta eta theta"
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([doc, None, doc]),
        }
    )
    pairs = simhash_dup_pairs(ray.data.from_arrow(t)).to_pandas()
    assert {(0, 2)} <= set(zip(pairs["doc_a"], pairs["doc_b"]))


# ---------------------------------------------------------------------------
# round-2 code-review fixes
# ---------------------------------------------------------------------------

def test_window_partials_count_star_semantics():
    """n_events must be COUNT(*), counting rows whose value is null."""
    from nifi_processors_ray.ops.events import _add_window_and_cents, _window_finalize, _window_partials

    batch = pa.table(
        {
            "ts": pa.array([1_000_000, 2_000_000, 3_000_000], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "event_type": pa.array(["a", "a", "a"]),
            "value": pa.array([1.0, None, 3.0], pa.float64()),
            "user_id": pa.array([1, 2, 3], pa.int64()),
        }
    )
    part = _window_partials(_add_window_and_cents(batch))
    fin = _window_finalize(part.sort_by([("window_hour", "ascending"), ("event_type", "ascending")])).to_pylist()
    assert fin[0]["n_events"] == 3          # COUNT(*), not COUNT(value)
    assert fin[0]["value_cents"] == 400     # null skipped by SUM
    assert fin[0]["n_users"] == 3


def test_quantile_null_values_match_sql_semantics():
    """COUNT(*) includes null-value rows; quantile_disc skips them."""
    from nifi_processors_ray.ops.events import _quantile_finalize, _quantile_partials

    batch = pa.table(
        {
            "event_type": pa.array(["a"] * 4 + ["b"]),
            "value": pa.array([1.0, 2.0, 3.0, None, None], pa.float64()),
        }
    )
    part = _quantile_partials(batch)
    fin = {r["event_type"]: r for r in _quantile_finalize(part).to_pylist()}
    assert fin["a"]["n_events"] == 4 and fin["a"]["p50_cents"] == 200
    assert fin["b"]["n_events"] == 1 and fin["b"]["p50_cents"] is None


def test_sink_null_int_key_partition_is_defined():
    from nifi_processors_ray.sinks import _assign_partition
    from nifi_processors_ray.functions.hashing import hash_ints_u64

    batch = pa.table({"k": pa.array([1, None, 3], pa.int64()), "x": pa.array([1, 2, 3])})
    out = _assign_partition(batch, "k", 8).column("__export_part").to_pylist()
    # note int() BEFORE the modulo: numpy uint64 % python-int promotes to
    # float64 and garbles the low bits
    expected_null = int(hash_ints_u64(np.array([0], dtype=np.int64))[0]) % 8
    assert out[1] == expected_null  # nulls pin to hash(0), platform-independent


def test_sink_all_done_fast_path_with_empty_partitions(ray_session, tmp_path):
    """Empty hash partitions get markers too — resume must not re-shuffle."""
    import ray.data

    from nifi_processors_ray.sinks import read_partitioned_parquet, write_partitioned_parquet

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()), "v": pa.array(list("abcd"))})
    )
    out = str(tmp_path / "exp")
    res1 = write_partitioned_parquet(ds, out, key="k", num_partitions=16)
    assert res1["skipped"] == 0 and res1["written"] == 16  # incl. empty markers
    res2 = write_partitioned_parquet(ds, out, key="k", num_partitions=16)
    assert res2 == {"written": 0, "skipped": 16, "rows_written": 0}
    assert read_partitioned_parquet(out).count() == 4


def test_environmental_failure_propagates_then_escalates(ray_session, tmp_path):
    """OSError outlasting max_attempts FAILS the epoch (exactly-once rerun,
    no silent loss); only after attempts exceed 3×max_attempts — i.e. the
    fault survived multiple full reruns, so it is deterministic — does it
    quarantine like poison, with the stream advancing and rows preserved."""
    import pytest

    from nifi_processors_ray.config import EngineConfig
    from nifi_processors_ray.pipelines.replay import CdcEngine
    from nifi_processors_ray.synth import write_changelog_from_events

    log = str(tmp_path / "log")
    write_changelog_from_events("/root/testdata/sf0.001", log, files=2)

    def always_os_error(t):
        raise OSError("disk on fire")

    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        EngineConfig(
            lake_dir=lake, changelog_paths=(log,), num_partitions=1, salt_factor=1,
            merge_policy=always_os_error, max_attempts=2,
        )
    )
    with pytest.raises(Exception):
        eng.replay()
    # nothing committed, nothing quarantined — the epoch simply failed
    man = eng.store.latest()
    assert man is None or (man.epoch == 0 and not man.deadletter_files)

    # keep rerunning: the durable attempt counter crosses 3×max_attempts
    # and the fault escalates to quarantine instead of wedging forever
    for _ in range(8):
        try:
            eng.replay()
            break
        except Exception:
            continue
    man = eng.store.latest()
    assert man is not None and man.deadletter_files
    assert eng.deadletter().count() > 0
    assert eng.replay() == []  # stream advanced, not stuck
    lin = eng.lineage().to_pandas()
    assert lin["attempt"].max() >= 6  # every attempt recorded
