"""Vacuum: deletes superseded files, never current or in-flight ones."""

import os

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.synth import write_generated_changelog


def _data_files(lake):
    out = []
    for root, _, files in os.walk(os.path.join(lake, "data")):
        out.extend(os.path.join(root, f) for f in files)
    return out


def test_vacuum_removes_orphans_keeps_live_state(tmp_path):
    log = str(tmp_path / "log")
    write_generated_changelog(log, 4000, files=2, n_convs=30, max_turns=16)
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            changelog_paths=(log,),
            num_partitions=8,
            salt_factor=2,
            epoch_events=500,  # 8 epochs → 7 generations of cow orphans
        )
    )
    eng.replay()
    before = eng.final_state(sort=True).to_pandas()
    n_before = len(_data_files(eng.cfg.lake_dir))

    deleted = eng.vacuum()
    assert deleted > 0
    n_after = len(_data_files(eng.cfg.lake_dir))
    assert n_after < n_before
    # every live (manifest-referenced) file survived
    man = eng.store.latest()
    for fs in man.files.values():
        for f in fs:
            assert os.path.exists(os.path.join(eng.cfg.lake_dir, f))
    # state unchanged and engine still usable
    after = eng.final_state(sort=True).to_pandas()
    assert before.equals(after)
    assert eng.run_epoch() is None  # still cleanly caught up
    # idempotent
    assert eng.vacuum() == 0


def test_vacuum_on_mor_lake(tmp_path):
    log = str(tmp_path / "log")
    write_generated_changelog(log, 4000, files=2, n_convs=30, max_turns=16)
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            changelog_paths=(log,),
            num_partitions=8,
            salt_factor=2,
            epoch_events=500,
            merge_mode="mor",
            compact_threshold=3,  # folds create delta orphans
        )
    )
    eng.replay()
    before = eng.final_state(sort=True).to_pandas()
    assert eng.vacuum() > 0
    assert before.equals(eng.final_state(sort=True).to_pandas())
