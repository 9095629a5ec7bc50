"""Manifest store: atomic commit, round-trip, CURRENT pointer."""

import json
import os

from nifi_processors_ray.state.manifest import Manifest, ManifestStore


def _man(epoch, wm):
    return Manifest(
        epoch=epoch,
        num_partitions=4,
        salt_factor=2,
        hash_fingerprint="fp",
        watermarks={p: wm for p in range(4)},
        files={0: [f"data/epoch={epoch}/part-00000.parquet"]},
        rows={0: 10},
    )


def test_roundtrip(tmp_path):
    store = ManifestStore(str(tmp_path))
    assert store.latest() is None
    store.commit(_man(1, 100))
    m = store.latest()
    assert m.epoch == 1 and m.watermark(2) == 100 and m.min_watermark == 100
    assert m.files[0] == ["data/epoch=1/part-00000.parquet"]


def test_current_points_to_latest(tmp_path):
    store = ManifestStore(str(tmp_path))
    store.commit(_man(1, 100))
    store.commit(_man(2, 200))
    assert store.latest().epoch == 2
    # older snapshot still readable (time travel)
    with open(tmp_path / "manifest-0000000001.json") as f:
        assert json.loads(f.read())["epoch"] == 1


def test_no_partial_manifest_files(tmp_path):
    store = ManifestStore(str(tmp_path))
    store.commit(_man(1, 100))
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]


def test_min_watermark_requires_all_partitions(tmp_path):
    m = Manifest(epoch=1, num_partitions=4, salt_factor=1, hash_fingerprint="fp",
                 watermarks={0: 5, 1: 5})
    assert m.min_watermark == -1  # unknown partitions → conservative


def test_writer_lock_excludes_second_writer(tmp_path):
    """Single-writer contract: while one holder has the lake's advisory
    lock, a second writer_lock() acquisition fails FAST and loud
    (flock conflicts between separate open file descriptions, so two
    fds in one process exercise the same kernel path two processes
    would)."""
    import fcntl

    import pytest

    store = ManifestStore(str(tmp_path))
    fd = os.open(os.path.join(store.dir, "LOCK"), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)  # the "other writer"
        with pytest.raises(RuntimeError, match="one writer per lake"):
            with store.writer_lock():
                pass
    finally:
        os.close(fd)
    # lock released (holder gone) -> acquisition succeeds
    with store.writer_lock():
        pass


def test_writer_lock_blocks_replay_of_locked_lake(tmp_path, ray_session):
    """End-to-end: an engine replay against a lake whose writer lock is
    held by another process-equivalent holder raises instead of racing
    the epoch commit."""
    import fcntl

    import pytest

    from nifi_processors_ray.config import EngineConfig
    from nifi_processors_ray.pipelines.replay import CdcEngine
    from nifi_processors_ray.synth import write_generated_changelog

    log = str(tmp_path / "log")
    write_generated_changelog(log, 500, files=1, n_convs=10)
    eng = CdcEngine(EngineConfig(
        lake_dir=str(tmp_path / "lake"), changelog_paths=(log,),
        num_partitions=2, salt_factor=1, epoch_events=1000,
    ))
    eng.current_manifest()  # creates the store dir (genesis commit)
    fd = os.open(os.path.join(eng.store.dir, "LOCK"), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        with pytest.raises(RuntimeError, match="one writer per lake"):
            eng.replay()
    finally:
        os.close(fd)
    results = eng.replay()  # holder gone: the same engine replays fine
    assert sum(r.n_applied for r in results) > 0
