"""Poison-batch quarantine: deterministic merge failure must not fail the
epoch, must not lose the other partitions, and must record the loss."""

import os

import pyarrow.parquet as pq
import pytest

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.synth import write_generated_changelog


@pytest.fixture()
def engine(tmp_path):
    log = str(tmp_path / "log")
    write_generated_changelog(log, 4000, files=2, n_convs=50)
    cfg = EngineConfig(
        lake_dir=str(tmp_path / "lake"),
        changelog_paths=(log,),
        num_partitions=8,
        salt_factor=2,
        epoch_events=2000,
    )
    return CdcEngine(cfg)


def test_corrupt_prior_file_deadletters_partition_only(engine):
    res1 = engine.run_epoch()
    assert res1 is not None and res1.n_applied > 0

    # poison ONE partition's lake file (truncated parquet = deterministic
    # ArrowInvalid on read)
    man = engine.store.latest()
    victim = min(p for p, fs in man.files.items() if fs)
    path = os.path.join(engine.cfg.lake_dir, man.files[victim][0])
    with open(path, "wb") as f:
        f.write(b"not a parquet file")

    res2 = engine.run_epoch()
    assert res2 is not None, "epoch must complete despite the poison partition"

    man2 = engine.store.latest()
    # the victim partition dead-lettered; the rest applied
    assert man2.deadletter_files, "dead-letter file must be recorded"
    dl = engine.deadletter()
    assert dl.count() > 0

    lineage = engine.lineage().to_pandas()
    errs = lineage[lineage["error"].notna()]
    assert set(errs["partition"]) == {victim}
    assert errs["n_applied"].eq(0).all()
    # watermark advanced globally (stream is not stuck)
    assert man2.min_watermark == res2.seq_hi
    # victim keeps its previous (corrupt→previous manifest's) file list;
    # healthy partitions were rewritten this epoch
    healthy = [p for p in man2.files if p != victim and man2.files[p]]
    assert any(f.startswith(f"data/epoch={res2.epoch}/") for p in healthy for f in man2.files[p])


def test_deadletter_rows_are_replayable(engine):
    engine.run_epoch()
    man = engine.store.latest()
    victim = min(p for p, fs in man.files.items() if fs)
    path = os.path.join(engine.cfg.lake_dir, man.files[victim][0])
    with open(path, "wb") as f:
        f.write(b"junk")
    engine.run_epoch()
    dl = engine.deadletter().to_pandas()
    # the quarantined rows are full change events (seq/op/keys intact)
    assert {"seq", "op", "conv_id", "turn_idx"} <= set(dl.columns)
    assert (dl["seq"] > man.min_watermark).all()


def test_reprocess_deadletters_converges_after_fix(engine, ray_session, tmp_path):
    """The failure-relationship re-queue: quarantine under a fault, FIX
    the fault, reprocess — the lake converges to the full-log oracle,
    the quarantine empties, and the reprocess epoch is in lineage."""
    import glob
    import shutil

    import pyarrow as pa
    from nifi_processors_ray.oracle import apply_changelog

    res1 = engine.run_epoch()
    man = engine.store.latest()
    victim = min(p for p, fs in man.files.items() if fs)
    path = os.path.join(engine.cfg.lake_dir, man.files[victim][0])
    backup = str(tmp_path / "backup.parquet")
    shutil.copy(path, backup)
    with open(path, "wb") as f:
        f.write(b"junk")

    res2 = engine.run_epoch()
    assert engine.store.latest().deadletter_files, "victim must quarantine"
    quarantined = engine.deadletter().count()
    assert quarantined > 0

    # the fix: restore the corrupted prior file
    shutil.copy(backup, path)

    res3 = engine.reprocess_deadletters()
    assert res3 is not None
    assert res3.n_applied == quarantined

    man3 = engine.store.latest()
    assert man3.deadletter_files == [], "quarantine must empty on success"
    # watermark unchanged: the tail resumes exactly where it was
    assert man3.min_watermark == engine.store.at_epoch(res2.epoch).min_watermark

    # converged state equals the naive full-log oracle
    from nifi_processors_ray.schema import CHANGELOG_SCHEMA, align_to_schema

    logs = sorted(glob.glob(os.path.join(engine.cfg.changelog_paths[0], "*.parquet")))
    log = pa.concat_tables(
        align_to_schema(pq.read_table(p), CHANGELOG_SCHEMA) for p in logs
    )
    oracle = apply_changelog(log).to_pandas().reset_index(drop=True)
    final = engine.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert final.equals(oracle), "reprocessed lake != oracle"

    # idempotent: nothing left to reprocess
    assert engine.reprocess_deadletters() is None
