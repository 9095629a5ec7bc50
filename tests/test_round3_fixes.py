"""Regression tests for the round-2 ADVICE findings.

- window_agg: null user_id must not count as a distinct user (SQL
  COUNT(DISTINCT) skips nulls).
- supplier_nation_rollup: a nation row with a dangling n_regionkey must
  drop its suppliers (INNER-join parity), not emit a NULL-region group.
- write_partitioned_parquet: resuming with different key/num_partitions
  must fail loud, not silently mix two partition layouts.
- run-integrity check: always on, env escape hatch honored.
"""

import json
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from nifi_processors_ray.functions import debug as DBG
from nifi_processors_ray.ops import events as EV
from nifi_processors_ray.ops import relational as REL
from nifi_processors_ray.sinks import write_partitioned_parquet


def test_window_agg_excludes_null_users_from_distinct(ray_session, tmp_path):
    d = str(tmp_path)
    ts = pa.array([1_000_000, 2_000_000, 3_000_000, 3_600_000_000 + 5], pa.timestamp("us"))
    tbl = pa.table(
        {
            "ts": ts,
            "event_type": pa.array(["a", "a", "a", "b"]),
            "value": pa.array([1.5, 2.5, None, 4.0], pa.float64()),
            "user_id": pa.array([7, None, None, None], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    got = pa.Table.from_pylist(EV.window_agg(d).take_all())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    want = con.sql(EV.WINDOW_AGG_SQL).arrow()
    # window (0, 'a'): 3 events, exactly ONE distinct user (two nulls skipped)
    assert got.to_pylist() == want.to_pylist()
    assert got.column("n_users").to_pylist() == [1, 0]


def test_rollup_drops_suppliers_of_dangling_regionkey(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["x", "y", "z"]),
                "s_nationkey": pa.array([0, 1, 1], pa.int32()),
                "s_acctbal": pa.array([10.0, 20.0, 30.0]),
            }
        ),
        os.path.join(d, "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int32()),
                "n_name": pa.array(["GOODLAND", "ORPHANIA"]),
                # nation 1 points at region 99, which does not exist
                "n_regionkey": pa.array([0, 99], pa.int32()),
            }
        ),
        os.path.join(d, "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {"r_regionkey": pa.array([0], pa.int32()), "r_name": pa.array(["HOME"])}
        ),
        os.path.join(d, "region.parquet"),
    )
    got = pa.Table.from_pylist(REL.supplier_nation_rollup(d).take_all())
    con = duckdb.connect()
    for t in ("supplier", "nation", "region"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    want = con.sql(REL.SUPPLIER_NATION_ROLLUP_SQL).arrow()
    assert got.to_pylist() == want.to_pylist()
    # specifically: only the resolvable nation's supplier survives
    assert got.column("nation").to_pylist() == ["GOODLAND"]


def test_export_meta_guard_rejects_changed_params(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(range(20), pa.int64()), "v": pa.array(range(20))})
    )
    write_partitioned_parquet(ds, out, "k", num_partitions=4)
    with open(os.path.join(out, "_meta.json")) as f:
        assert json.load(f) == {"key": "k", "num_partitions": 4, "assign": "hash"}
    # simulate a crashed partition, then a resume with DIFFERENT modulus
    os.remove(os.path.join(out, "part=00001", "_DONE"))
    with pytest.raises(ValueError, match="resume parameter mismatch"):
        write_partitioned_parquet(ds, out, "k", num_partitions=8)
    with pytest.raises(ValueError, match="resume parameter mismatch"):
        write_partitioned_parquet(ds, out, "v", num_partitions=4)
    # same params: resumes and completes
    res = write_partitioned_parquet(ds, out, "k", num_partitions=4)
    assert res["skipped"] == 3 and res["written"] == 1


def test_cow_split_multifile_partitions_at_replay_scale(ray_session, tmp_path):
    """A full-size replay epoch with target_rows_per_file small enough to
    split every partition into several COW files: the manifest carries
    multi-file partitions, _read_prior handles them, and the converged
    state still equals the naive oracle fold (round-2 verdict #9 —
    previously only covered at 2-partition unit scale)."""
    from nifi_processors_ray.config import EngineConfig
    from nifi_processors_ray.oracle import apply_changelog
    from nifi_processors_ray.pipelines.replay import CdcEngine
    from nifi_processors_ray.schema import CHANGELOG_SCHEMA, align_to_schema
    from nifi_processors_ray.synth import write_generated_changelog

    log = str(tmp_path / "log")
    paths = write_generated_changelog(log, 200_000, files=8)
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            changelog_paths=(log,),
            num_partitions=8,
            salt_factor=2,
            epoch_events=100_000,  # 2 epochs: the split files are re-READ + re-split
            target_rows_per_file=1_000,
        )
    )
    eng.replay()
    man = eng.store.latest()
    files_per_part = {p: len(fs) for p, fs in man.files.items() if fs}
    assert len(files_per_part) == 8
    assert min(files_per_part.values()) > 1, files_per_part  # every partition split
    final = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    oracle = apply_changelog(
        pa.concat_tables(
            align_to_schema(pq.read_table(p), CHANGELOG_SCHEMA) for p in paths
        )
    ).to_pandas().reset_index(drop=True)
    assert len(final) == len(oracle) and final.equals(oracle)


def test_run_integrity_default_on_with_escape_hatch(monkeypatch):
    # the check+repair is ALWAYS ON (it replaced the old version-gated
    # arming); NPR_DEBUG_COLOCATION=0 is the explicit escape hatch
    monkeypatch.delenv(DBG.ENV_FLAG, raising=False)
    assert DBG.run_integrity_enabled()
    monkeypatch.setenv(DBG.ENV_FLAG, "0")
    assert not DBG.run_integrity_enabled()
    monkeypatch.setenv(DBG.ENV_FLAG, "1")
    assert DBG.run_integrity_enabled()
