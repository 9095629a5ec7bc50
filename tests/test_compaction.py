"""Metadata compaction: consolidates lineage/rejected files, content-identical."""

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.synth import write_generated_changelog


def test_compact_metadata_preserves_content(tmp_path):
    log = str(tmp_path / "log")
    write_generated_changelog(log, 6000, files=3, n_convs=40, invalid_frac=0.05)
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            changelog_paths=(log,),
            num_partitions=8,
            salt_factor=2,
            epoch_events=1500,  # force multiple epochs → multiple metadata files
        )
    )
    results = eng.replay()
    assert len(results) >= 3
    man = eng.store.latest()
    assert len(man.lineage_files) >= 3 and len(man.rejected_files) >= 2

    before_lineage = eng.lineage().to_pandas().sort_values(["commit_epoch", "partition"]).reset_index(drop=True)
    before_rejected = eng.rejected().to_pandas().sort_values("seq").reset_index(drop=True)

    new_man = eng.compact_metadata()
    assert len(new_man.lineage_files) == 1 and len(new_man.rejected_files) == 1
    assert new_man.epoch == man.epoch + 1
    assert new_man.watermarks == man.watermarks and new_man.files == man.files

    after_lineage = eng.lineage().to_pandas().sort_values(["commit_epoch", "partition"]).reset_index(drop=True)
    after_rejected = eng.rejected().to_pandas().sort_values("seq").reset_index(drop=True)
    assert before_lineage.equals(after_lineage)
    assert before_rejected.equals(after_rejected)

    # replay still resumes cleanly after compaction (no state disturbed)
    assert eng.run_epoch() is None  # caught up

    # vacuum now reclaims the superseded per-epoch metadata files
    assert eng.vacuum() > 0
    assert after_lineage.equals(
        eng.lineage().to_pandas().sort_values(["commit_epoch", "partition"]).reset_index(drop=True)
    )
