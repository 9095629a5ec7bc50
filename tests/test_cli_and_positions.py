"""CLI surface + initial-position and type-widening semantics."""

import json
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nifi_processors_ray.config import LATEST, EngineConfig
from nifi_processors_ray.oracle import apply_changelog
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.synth import generate_changelog, write_generated_changelog


def test_latest_initial_position_skips_existing_log(tmp_path):
    log = str(tmp_path / "log")
    write_generated_changelog(log, 2000, files=2, n_convs=20)
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            changelog_paths=(log,),
            num_partitions=4,
            salt_factor=2,
            initial_position=LATEST,
        )
    )
    assert eng.replay() == []  # already at the head: nothing to do
    # new events arriving after start ARE consumed
    extra = generate_changelog(500, n_convs=20, seed=99)
    extra = extra.set_column(0, "seq", pa.array(np.asarray(extra.column("seq")) + 2000))
    pq.write_table(extra, f"{log}/changelog-99999.parquet")
    eng.log_infos(refresh=True)
    results = eng.replay()
    assert sum(r.n_applied for r in results) > 0
    assert eng.store.latest().min_watermark == 2499


def test_widened_turn_idx_type_is_unified(tmp_path):
    """A later producer widening turn_idx to int64 must still replay."""
    log = tmp_path / "log"
    log.mkdir()
    ch = generate_changelog(1000, n_convs=20, invalid_frac=0.0)
    first = ch.slice(0, 500)
    second = ch.slice(500)
    widened = second.set_column(
        3, "turn_idx", second.column("turn_idx").cast(pa.int64())
    )
    pq.write_table(first, str(log / "a.parquet"))
    pq.write_table(widened, str(log / "b.parquet"))
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            changelog_paths=(str(log),),
            num_partitions=4,
            salt_factor=2,
        )
    )
    eng.replay()
    got = eng.final_state(sort=True).to_pandas()
    want = apply_changelog(ch).to_pandas()
    assert len(got) == len(want)
    assert (got["text"].values == want["text"].values).all()


def test_tz_aware_ts_drift_applies_as_utc_instant(tmp_path):
    """A producer that starts writing tz-aware timestamps (schema drift
    on `ts`) must keep replaying — the lenient alignment casts to the
    lake's naive micros.  PINNED SEMANTICS: the cast preserves the UTC
    INSTANT — a correctly-stored 12:00+05:00 (= 07:00 UTC) lands as
    naive 07:00.  ts is payload (merge order is seq), so this is a
    fidelity contract: if a pyarrow upgrade flips the cast to
    wall-clock, this test fails loud and the choice gets re-made
    deliberately.  (Fixture goes through pandas because
    ``pa.array([dt], pa.timestamp(tz=...))`` silently IGNORES the
    datetime's tzinfo — an instant-corrupting quirk a real producer's
    pandas/Spark write path does not have.)"""
    import datetime as dt

    import pandas as pd

    log = tmp_path / "log"
    log.mkdir()
    wall = dt.datetime(2026, 1, 1, 12, 0, 0, tzinfo=dt.timezone(dt.timedelta(hours=5)))
    ts_arr = pa.Array.from_pandas(pd.Series([pd.Timestamp(wall)])).cast(
        pa.timestamp("us", tz="+05:00")
    )
    assert ts_arr.cast(pa.int64())[0].as_py() == int(
        wall.timestamp() * 1_000_000
    )  # fixture really stores the 07:00 UTC instant
    t = pa.table(
        {
            "seq": pa.array([1], pa.int64()),
            "op": ["I"],
            "conv_id": ["tzc"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ["x"],
            "tool": pa.array([None], pa.string()),
            "ts": ts_arr,
            "batch_id": ["b1"],
        }
    )
    pq.write_table(t, str(log / "a.parquet"))
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake_tz"),
            changelog_paths=(str(log),),
            num_partitions=2,
            salt_factor=1,
        )
    )
    eng.replay()
    got = eng.final_state(sort=True).to_pandas()
    assert len(got) == 1 and eng.rejected().count() == 0
    # instant-preserving: 12:00+05:00 == 07:00 UTC → naive 07:00
    assert got["ts"].iloc[0].to_pydatetime() == dt.datetime(2026, 1, 1, 7, 0, 0)


def test_cli_replay_status_metrics(tmp_path):
    log = str(tmp_path / "log")
    write_generated_changelog(log, 1500, files=2, n_convs=20)
    lake = str(tmp_path / "lake")
    base = [
        sys.executable,
        "-m",
        "nifi_processors_ray",
        "replay",
        "--lake",
        lake,
        "--log",
        log,
        "--partitions",
        "4",
    ]
    env = {"RAY_ADDRESS": "local", "PATH": "/usr/bin:/bin", "HOME": "/root"}
    r = subprocess.run(base, capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-1500:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["applied"] > 0 and rep["epochs"] >= 1

    for cmd, checks in (("status", ("committed", "min_watermark")), ("metrics", ())):
        argv = [a if a != "replay" else cmd for a in base]
        r2 = subprocess.run(argv, capture_output=True, text=True, cwd="/root/repo")
        assert r2.returncode == 0, r2.stderr[-1500:]
        out = json.loads(r2.stdout.strip().splitlines()[-1])
        for k in checks:
            assert k in out


def test_cli_metrics_levels(tmp_path):
    """NONE/SUMMARY/DETAILED granularity knob (the reference's CloudWatch
    metrics-level descriptor, consumer/AbstractKinesisConsumerProcessor
    .java:193-224)."""
    log = str(tmp_path / "log")
    write_generated_changelog(log, 1200, files=2, n_convs=20)
    lake = str(tmp_path / "lake")
    base = [sys.executable, "-m", "nifi_processors_ray", "replay",
            "--lake", lake, "--log", log, "--partitions", "4"]
    r = subprocess.run(base, capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-1500:]

    def metrics(level):
        argv = [a if a != "replay" else "metrics" for a in base] + ["--metrics-level", level]
        r2 = subprocess.run(argv, capture_output=True, text=True, cwd="/root/repo")
        assert r2.returncode == 0, r2.stderr[-1500:]
        return json.loads(r2.stdout.strip().splitlines()[-1])

    assert metrics("none") == []
    summary = metrics("summary")
    assert len(summary) == 1 and summary[0]["applied"] > 0
    detailed = metrics("detailed")
    assert len(detailed) >= 1 and {"partition", "applied"} <= set(detailed[0])
    assert sum(row["applied"] for row in detailed) == summary[0]["applied"]


def test_cli_bootstrap_expire_changes(tmp_path):
    """The round-3 lifecycle subcommands: bootstrap (snapshot + tail),
    expire (manifest history bound) and changes (epoch feed as JSONL)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from nifi_processors_ray.oracle import apply_changelog
    from nifi_processors_ray.schema import CHANGELOG_SCHEMA, align_to_schema

    log = str(tmp_path / "log")
    paths = write_generated_changelog(log, 1500, files=2, n_convs=20)
    full = pa.concat_tables(
        align_to_schema(pq.read_table(p), CHANGELOG_SCHEMA) for p in paths
    )
    snap = apply_changelog(full.filter(pc.less_equal(full.column("seq"), 699)))
    snap_path = str(tmp_path / "snap.parquet")
    pq.write_table(snap, snap_path)
    lake = str(tmp_path / "lake")

    def run(cmd, *extra):
        argv = [
            sys.executable, "-m", "nifi_processors_ray", cmd,
            "--lake", lake, "--log", log, "--partitions", "4",
            "--epoch-events", "300", *extra,
        ]
        r = subprocess.run(argv, capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-1500:]
        return r.stdout.strip().splitlines()

    out = json.loads(run(
        "bootstrap", "--snapshot", snap_path, "--as-of-seq", "699", "--then-replay"
    )[-1])
    assert out["epoch"] == 1 and out["applied"] > 0 and out["tail_epochs"] >= 1

    # the converged CLI lake equals the full-replay oracle
    from nifi_processors_ray.config import EngineConfig
    from nifi_processors_ray.pipelines.replay import CdcEngine

    eng = CdcEngine(EngineConfig(
        lake_dir=lake, changelog_paths=(log,), num_partitions=4, epoch_events=300
    ))
    got = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    want = apply_changelog(full).to_pandas().reset_index(drop=True)
    assert got.equals(want)

    feed_lines = [json.loads(l) for l in run("changes") if l.startswith("{")]
    assert feed_lines and all("conv_id" in r and "op" in r for r in feed_lines)
    # a null ts must serialize as JSON null, never the string "None"
    # (the generated stream's deletes carry real timestamps, so this
    # guards the encoding rule rather than exercising a null row here)
    assert all(r["ts"] is None or r["ts"] != "None" for r in feed_lines)

    before = len(eng.store.epochs())
    out = json.loads(run("expire", "--keep-last", "2")[-1])
    assert out["expired"] == max(0, before - 2)


def test_cli_forget(tmp_path):
    """The erasure lifecycle end-to-end through the CLI: replay, forget
    one conversation, confirm it left the status row counts, and a
    second forget reports zero."""
    log = str(tmp_path / "log")
    write_generated_changelog(log, 1500, files=2, n_convs=20)
    lake = str(tmp_path / "lake")
    base = [sys.executable, "-m", "nifi_processors_ray", "replay",
            "--lake", lake, "--log", log, "--partitions", "4"]
    r = subprocess.run(base, capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-1500:]

    fargv = [a if a != "replay" else "forget" for a in base] + ["--conv", "conv-0"]
    r2 = subprocess.run(fargv, capture_output=True, text=True, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-1500:]
    rep = json.loads(r2.stdout.strip().splitlines()[-1])
    assert rep["forgotten"] > 0
    # idempotent: nothing left to erase
    r3 = subprocess.run(fargv, capture_output=True, text=True, cwd="/root/repo")
    assert r3.returncode == 0, r3.stderr[-1500:]
    assert json.loads(r3.stdout.strip().splitlines()[-1]) == {"forgotten": 0}
    # no --conv → usage error
    bad = [a if a != "replay" else "forget" for a in base]
    r4 = subprocess.run(bad, capture_output=True, text=True, cwd="/root/repo")
    assert r4.returncode == 2


def test_cli_compact_and_export(tmp_path):
    """The maintenance + hand-off surface: `compact` folds MOR deltas
    with state unchanged; `export` writes the converged state through
    the resumable partitioned sink (re-run skips finished partitions)."""
    log = str(tmp_path / "log")
    write_generated_changelog(log, 1500, files=2, n_convs=20)
    lake = str(tmp_path / "lake")
    base = [
        sys.executable, "-m", "nifi_processors_ray", "replay",
        "--lake", lake, "--log", log, "--partitions", "4",
        "--epoch-events", "300", "--merge-mode", "mor",
    ]
    r = subprocess.run(base, capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-1500:]

    argv = [a if a != "replay" else "compact" for a in base]
    r2 = subprocess.run(argv, capture_output=True, text=True, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-1500:]
    rec = json.loads(r2.stdout.strip().splitlines()[-1])
    assert rec["partitions_compacted"] > 0
    assert rec["files_after"] < rec["files_before"]

    out_dir = str(tmp_path / "export")
    argv = [a if a != "replay" else "export" for a in base] + [
        "--output", out_dir, "--export-partitions", "4",
    ]
    r3 = subprocess.run(argv, capture_output=True, text=True, cwd="/root/repo")
    assert r3.returncode == 0, r3.stderr[-1500:]
    rec3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert rec3["written"] == 4 and rec3["rows_written"] > 0
    # per-partition files are (conv_id, turn_idx)-ordered for readers
    import glob

    f0 = sorted(glob.glob(out_dir + "/part=*/data.parquet"))[0]
    t0 = pq.read_table(f0)
    assert t0.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]).equals(t0)
    # resumable: the same-epoch re-run skips every finished partition
    r4 = subprocess.run(argv, capture_output=True, text=True, cwd="/root/repo")
    rec4 = json.loads(r4.stdout.strip().splitlines()[-1])
    assert (rec4["written"], rec4["skipped"], rec4["rows_written"]) == (0, 4, 0)
    # the lake advances (a stateless compaction epoch counts) → the
    # stale-export guard refuses rather than hand back old state
    subprocess.run(
        [a if a != "replay" else "forget" for a in base] + ["--conv", "conv-0"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    r5 = subprocess.run(argv, capture_output=True, text=True, cwd="/root/repo")
    assert r5.returncode == 2
    assert "immutable" in r5.stderr


def test_cli_diff(tmp_path):
    import pandas as pd

    """`diff --from-epoch A [--to-epoch B]` emits the snapshot diff as
    JSONL and matches the library's state_diff exactly."""
    log = str(tmp_path / "log")
    write_generated_changelog(log, 1200, files=2, n_convs=20)
    lake = str(tmp_path / "lake")

    def run(cmd, *extra):
        argv = [
            sys.executable, "-m", "nifi_processors_ray", cmd,
            "--lake", lake, "--log", log, "--partitions", "4",
            "--epoch-events", "300", *extra,
        ]
        r = subprocess.run(argv, capture_output=True, text=True, cwd="/root/repo")
        return r

    assert run("replay").returncode == 0
    r = run("diff", "--from-epoch", "1")
    assert r.returncode == 0, r.stderr[-1500:]
    rows = [json.loads(l) for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert rows and all(
        set(x) == {"conv_id", "turn_idx", "change_kind"}
        and x["change_kind"] in ("added", "updated", "deleted")
        for x in rows
    )

    from nifi_processors_ray.config import EngineConfig
    from nifi_processors_ray.pipelines.replay import CdcEngine

    eng = CdcEngine(EngineConfig(
        lake_dir=lake, changelog_paths=(log,), num_partitions=4, epoch_events=300
    ))
    want = eng.state_diff(1).to_pandas()
    got = pd.DataFrame(rows)
    got["turn_idx"] = got["turn_idx"].astype(want["turn_idx"].dtype)
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))

    # missing --from-epoch fails loud
    r2 = run("diff")
    assert r2.returncode != 0 and "from-epoch" in (r2.stderr + r2.stdout)


def test_cli_hot_keys(tmp_path):
    """`hot-keys --top N` emits the churn report as JSONL, ordered
    (n_changes DESC, conv_id), matching the library's hot_keys."""
    import pandas as pd

    log = str(tmp_path / "log")
    write_generated_changelog(log, 1200, files=2, n_convs=20)
    lake = str(tmp_path / "lake")

    def run(cmd, *extra):
        argv = [
            sys.executable, "-m", "nifi_processors_ray", cmd,
            "--lake", lake, "--log", log, "--partitions", "4",
            "--epoch-events", "300", *extra,
        ]
        return subprocess.run(argv, capture_output=True, text=True, cwd="/root/repo")

    assert run("replay").returncode == 0
    r = run("hot-keys", "--top", "5")
    assert r.returncode == 0, r.stderr[-1500:]
    rows = [json.loads(l) for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert 0 < len(rows) <= 5
    assert all(
        set(x) == {"conv_id", "n_changes", "n_inserts", "n_updates", "n_deletes"}
        and x["n_changes"] == x["n_inserts"] + x["n_updates"] + x["n_deletes"]
        for x in rows
    )

    from nifi_processors_ray.config import EngineConfig
    from nifi_processors_ray.pipelines.replay import CdcEngine

    eng = CdcEngine(EngineConfig(
        lake_dir=lake, changelog_paths=(log,), num_partitions=4, epoch_events=300
    ))
    want = eng.hot_keys(top_n=5).to_pandas()
    assert pd.DataFrame(rows).equals(want.reset_index(drop=True))


def test_hot_keys_latest_position_counts_only_consumed_events(tmp_path):
    """A LATEST lake's churn report covers the CONSUMED stream only:
    events before the pinned start position never appear in it."""
    log = str(tmp_path / "log")
    write_generated_changelog(log, 2000, files=2, n_convs=20)
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            changelog_paths=(log,),
            num_partitions=4,
            salt_factor=2,
            initial_position=LATEST,
        )
    )
    assert eng.replay() == []  # pinned at head: nothing consumed
    got = eng.hot_keys()
    assert got.count() == 0  # pre-position events are NOT counted

    # consume a post-position batch; the report must cover exactly it
    extra = generate_changelog(500, n_convs=20, seed=99)
    extra = extra.set_column(0, "seq", pa.array(np.asarray(extra.column("seq")) + 2000))
    pq.write_table(extra, f"{log}/changelog-99999.parquet")
    eng.log_infos(refresh=True)
    eng.replay()
    rep = eng.hot_keys(top_n=1000).to_pandas()
    from nifi_processors_ray.stages.validate import validate_batch
    import pyarrow.compute as pc

    v = validate_batch(extra)
    n_valid = int(pc.sum(pc.is_null(v.column("reject_reason"))).as_py() or 0)
    assert int(rep["n_changes"].sum()) == n_valid


def test_hot_keys_latest_expired_genesis_fails_loud(ray_session, tmp_path):
    """A LATEST lake whose genesis manifest was expired cannot bound the
    consumed window: hot_keys must refuse rather than silently count
    never-consumed pre-position events."""
    log = str(tmp_path / "log")
    write_generated_changelog(log, 2000, files=2, n_convs=20)
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            changelog_paths=(log,),
            num_partitions=4,
            salt_factor=2,
            epoch_events=300,
            initial_position=LATEST,
        )
    )
    eng.replay()  # pins at head
    extra = generate_changelog(900, n_convs=20, seed=7)
    extra = extra.set_column(0, "seq", pa.array(np.asarray(extra.column("seq")) + 2000))
    pq.write_table(extra, f"{log}/changelog-99999.parquet")
    eng.log_infos(refresh=True)
    eng.replay()  # 3 epochs of 300
    eng.expire_snapshots(keep_last=1)  # genesis gone
    with pytest.raises(ValueError, match="LATEST lake.*genesis"):
        eng.hot_keys()
